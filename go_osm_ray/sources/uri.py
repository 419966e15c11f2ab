"""URI scheme routing + path utilities (reference S13/S15).

Mirrors osm/Resource.go:46-107 (scheme dispatch), osm/SplitUri.go:9-16,
osm/ParsePath.go:13-19 (home expansion), cmd/osm/main.go:306-327 (glob
expansion), and osm/LoadIniSection.go:8-26 (GDAL-ini convenience
options). Remote schemes (http/https/hdfs/s3) resolve to the pyarrow
filesystem layer (`pyarrow.fs` / fsspec URLs pass straight into
ray.data read_* calls); this sandbox has no network, so they are routed
but not exercised by tests.
"""

from __future__ import annotations

import configparser
import glob as _glob
import os


KNOWN_SCHEMES = ("file", "http", "https", "s3", "hdfs",
                 "stdin", "stdout", "stderr")


def split_uri(uri: str) -> tuple[str, str]:
    """(scheme, path); scheme '' when absent (SplitUri.go:9-16)."""
    if "://" in uri:
        scheme, _, rest = uri.partition("://")
        return scheme, rest
    if uri in ("stdin", "stdout", "stderr"):
        return uri, ""
    return "", uri


def resolve_uri(uri: str) -> dict:
    """Route a URI to a read strategy:

    returns ``{"scheme", "paths"|"url"}`` — local file/globs expand to
    concrete path lists (main.go:306-327); remote URLs pass through for
    pyarrow.fs; std streams are flagged (the reference supports stdin
    planets, Input.go:38-45 — niche; our engine surfaces them for the
    CLI layer to handle driver-side)."""
    scheme, path = split_uri(uri)
    if scheme in ("", "file"):
        path = os.path.expanduser(path)
        if any(c in path for c in "*?["):
            paths = sorted(_glob.glob(path))
            if not paths:
                raise FileNotFoundError(f"glob matched nothing: {uri}")
            return {"scheme": "file", "paths": paths}
        return {"scheme": "file", "paths": [path]}
    if scheme in ("http", "https", "s3", "hdfs"):
        return {"scheme": scheme, "url": uri}
    if scheme in ("stdin", "stdout", "stderr"):
        return {"scheme": scheme}
    raise ValueError(f"unknown uri scheme {scheme!r} in {uri!r}")


# ------------------------------------------------- remote filesystems

def _fs_from_uri(uri: str):
    """pyarrow-native filesystems (s3://, hdfs://) — FileSystem.from_uri
    returns (fs, path-inside-fs); credentials/endpoints come from the
    standard env/config chain exactly like the reference's session chain
    (s3util/NewSessionWithCredentials.go)."""
    from pyarrow import fs as pafs
    return pafs.FileSystem.from_uri(uri)


def _http_fs(uri: str):
    """http(s) via fsspec wrapped for pyarrow (Input.go:100-140 reads
    HTTP planets through a plain GET stream)."""
    try:
        import fsspec
        from pyarrow.fs import FSSpecHandler, PyFileSystem
    except ImportError as e:  # pragma: no cover - fsspec is a ray dep
        raise RuntimeError("http(s) sources need fsspec") from e
    scheme, path = split_uri(uri)
    return PyFileSystem(FSSpecHandler(fsspec.filesystem(scheme))), uri


# scheme -> factory(uri) -> (pyarrow FileSystem, path). Overridable so
# tests (and embedders) can mount fakes without network.
FS_FACTORIES = {
    "s3": _fs_from_uri,
    "hdfs": _fs_from_uri,
    "http": _http_fs,
    "https": _http_fs,
}


def open_input(uri: str) -> tuple[list[str], object | None]:
    """Resolve any supported URI to (paths, filesystem) consumable by
    ``ray.data.read_parquet`` / ``read_binary_files`` (filesystem=None
    means local). This is the end-to-end form of the reference's input
    scheme dispatch (osm/Input.go:100-209): the same job spec runs
    against file/glob, s3://, hdfs:// and http(s):// inputs."""
    r = resolve_uri(uri)
    if r["scheme"] == "file":
        return r["paths"], None
    if "url" in r:
        fs, path = FS_FACTORIES[r["scheme"]](uri)
        return [path], fs
    raise ValueError(f"scheme {r['scheme']!r} is not a readable input "
                     f"(stdin is handled driver-side by the job runner)")


# ------------------------------------------------- output side (K8/K9)

def open_output(uri: str) -> tuple[object | None, str]:
    """(filesystem | None, path) for a writable output location —
    None filesystem means local. Same factory registry as inputs."""
    scheme, path = split_uri(uri)
    if scheme in ("", "file"):
        return None, os.path.expanduser(path)
    if scheme in FS_FACTORIES:
        return FS_FACTORIES[scheme](uri)
    raise ValueError(f"unwritable scheme {scheme!r} in {uri!r}")


def _is_std(uri: str) -> bool:
    return split_uri(uri)[0] in ("stdin", "stdout", "stderr")


def output_exists(uri: str) -> bool:
    """Overwrite-protection probe (cmd/osm/main.go:521-575: HeadObject
    for s3, Stat for file/hdfs); std streams never 'exist'."""
    if _is_std(uri):
        return False
    fs, path = open_output(uri)
    if fs is None:
        return os.path.exists(path)
    from pyarrow import fs as pafs
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def delete_output(uri: str) -> None:
    """Overwrite pre-flight delete (s3util/DeleteObject.go via
    main.go:586-598; local rm -r)."""
    if _is_std(uri):
        return
    fs, path = open_output(uri)
    if fs is None:
        import shutil
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        return
    from pyarrow import fs as pafs
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.Directory:
        fs.delete_dir(path)
    elif info.type != pafs.FileType.NotFound:
        fs.delete_file(path)


def ensure_output_parent(uri: str) -> None:
    """MkdirAll for file/hdfs parents, bucket-create-shaped for object
    stores (main.go:603-637); pyarrow's create_dir is the umbrella op."""
    if _is_std(uri):
        return
    fs, path = open_output(uri)
    parent = os.path.dirname(path.rstrip("/"))
    if not parent:
        return
    if fs is None:
        os.makedirs(parent, exist_ok=True)
    else:
        fs.create_dir(parent, recursive=True)


def list_output_dir(uri: str) -> list[str]:
    """Sorted file NAMES directly under a directory URI ([] when the
    directory does not exist). Works for local paths and every
    FS_FACTORIES scheme — the reconcile step of resumable sinks uses
    this instead of os.listdir so remote outputs behave identically."""
    fs, path = open_output(uri)
    if fs is None:
        return sorted(os.listdir(path)) if os.path.isdir(path) else []
    from pyarrow import fs as pafs
    sel = pafs.FileSelector(path.rstrip("/"), allow_not_found=True)
    return sorted(os.path.basename(i.path) for i in fs.get_file_info(sel)
                  if i.type == pafs.FileType.File)


def put_bytes(uri: str, data: bytes) -> int:
    """Single-object put with the reference's compression contract
    (s3util/PutObject.go:23-61): gzip when the key ends ``.gz``; bz2 is
    SUPPORTED here (python stdlib) where the reference errors out —
    documented improvement. Returns bytes written."""
    import bz2 as _bz2
    import gzip as _gzip
    if uri.endswith(".gz"):
        data = _gzip.compress(data)
    elif uri.endswith(".bz2"):
        data = _bz2.compress(data)
    fs, path = open_output(uri)
    if fs is None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    else:
        with fs.open_output_stream(path) as f:
            f.write(data)
    return len(data)


# GDAL-ini option names -> job-spec drop_attrs entries
# (LoadIniSection.go:8-26 applied at cmd/osm/main.go:411-425)
_INI_ATTRS = {"osm_version": "version", "osm_timestamp": "timestamp",
              "osm_changeset": "changeset", "osm_uid": "uid",
              "osm_user": "user"}
_TRUTHY = {"yes", "true", "y", "1", "t", "on"}  # ParseBool.go:3-5


def load_ini_options(path: str, section: str = "points") -> dict:
    """Read a GDAL-style ini section into job-spec options: an attr whose
    flag is FALSY is dropped (the reference keeps attrs marked 'yes')."""
    cp = configparser.ConfigParser()
    with open(path) as f:
        cp.read_string("[___root___]\n" + f.read())
    sec = section if cp.has_section(section) else "___root___"
    drop = [attr for opt, attr in _INI_ATTRS.items()
            if cp.has_option(sec, opt)
            and cp.get(sec, opt).strip().lower() not in _TRUTHY]
    out: dict = {}
    if drop:
        out["drop_attrs"] = drop
    if cp.has_option(sec, "attributes"):
        out["include_keys"] = [k.strip() for k in
                               cp.get(sec, "attributes").split(",") if k.strip()]
    return out
