"""HCL-subset config loader (reference S14).

The reference loads job configs with ``hcl.Parse`` + ``DecodeObject``
into ``Config{Globals, InputConfigs, OutputConfigs}``
(/root/reference/osm/LoadConfig.go:15-44, field tags in
osm/Config.go:12-34, osm/InputConfig.go:3-17, osm/OutputConfig.go:3-19,
osm/Filter.go:16-25). This module parses the HCL1 subset those structs
exercise — nested blocks, repeated blocks, ``key = value`` with string /
bool / number / list values, ``#``//``//`` comments — and maps the
reference's field names onto the engine's job-spec dict (job.run_job).

Field mapping (reference hcl tag -> spec option):
  keep_keys / drop_keys        -> include_keys / exclude_keys (tag
                                  PROJECTION — "this is not a filter")
  filter { keys_keep/keys_drop } -> keys_to_keep / keys_to_drop (row filter)
  filter { expression }          -> filter (DFL-subset expression)
  filter { bbox }                -> bbox
  drop_version/changeset/timestamp/user_id/user_name -> drop_attrs entries
  drop_nodes / drop_ways / drop_relations / ways_to_nodes / pretty -> as-is
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<comment>\#[^\n]*|//[^\n]*) |
      (?P<lbrace>\{) | (?P<rbrace>\}) |
      (?P<lbrack>\[) | (?P<rbrack>\]) |
      (?P<comma>,) | (?P<eq>=) |
      (?P<str>"(?:[^"\\]|\\.)*") |
      (?P<num>-?\d+(?:\.\d+)?) |
      (?P<ident>[A-Za-z_][A-Za-z0-9_\-]*)
    )""", re.VERBOSE)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad HCL at {text[pos:pos + 40]!r}")
        pos = m.end()
        if m.lastgroup != "comment":
            out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of HCL")
        t = self.toks[self.i]
        self.i += 1
        return t

    def body(self, top: bool = False) -> dict:
        """Block body: key = value | key { ... } entries. Repeated block
        keys accumulate into a list (hcl1 DecodeObject semantics for
        `hcl:"inputs"` slices)."""
        out: dict = {}
        while True:
            k = self.peek()
            if k is None:
                if top:
                    return out
                raise ValueError("unterminated block")
            if k == "rbrace":
                self.next()
                return out
            kind, name = self.next()
            if kind != "ident":
                raise ValueError(f"expected key, got {name!r}")
            kind2 = self.peek()
            if kind2 == "eq":
                self.next()
                val = self.value()
            elif kind2 == "lbrace":
                self.next()
                val = self.body()
            else:
                raise ValueError(f"expected '=' or '{{' after {name!r}")
            if name in out:
                prev = out[name]
                if _is_blocklist(prev) and isinstance(val, dict):
                    prev.append(val)
                else:
                    out[name] = [prev, val]
            else:
                out[name] = val
        return out

    def value(self):
        kind, text = self.next()
        if kind == "str":
            return re.sub(r"\\(.)", r"\1", text[1:-1])
        if kind == "num":
            return float(text) if "." in text else int(text)
        if kind == "ident":
            low = text.lower()
            if low in ("true", "false"):
                return low == "true"
            return text
        if kind == "lbrack":
            items = []
            while self.peek() != "rbrack":
                if self.peek() == "comma":
                    self.next()
                    continue
                items.append(self.value())
            self.next()
            return items
        if kind == "lbrace":
            return self.body()
        raise ValueError(f"unexpected value token {text!r}")


def _is_blocklist(v) -> bool:
    return isinstance(v, list) and all(isinstance(x, dict) for x in v)


def parse_hcl(text: str) -> dict:
    """HCL1-subset text -> plain dict (repeated blocks -> list of dicts)."""
    return _Parser(_tokenize(text)).body(top=True)


_DROP_ATTR_FLAGS = {
    "drop_version": "version",
    "drop_changeset": "changeset",
    "drop_timestamp": "timestamp",
    "drop_user_id": "uid",
    "drop_user_name": "user",
}
_PASS_KEYS = ("uri", "format", "kind", "drop_nodes", "drop_ways",
              "drop_relations", "ways_to_nodes", "pretty", "overwrite",
              "gdal_ini", "columns")


def _map_resource(r: dict) -> dict:
    """Reference InputConfig/OutputConfig fields -> spec options."""
    out = {k: v for k, v in r.items() if k in _PASS_KEYS}
    if r.get("keep_keys"):
        out["include_keys"] = list(r["keep_keys"])
    if r.get("drop_keys"):
        out["exclude_keys"] = list(r["drop_keys"])
    drop_attrs = [attr for flag, attr in _DROP_ATTR_FLAGS.items()
                  if r.get(flag)]
    if drop_attrs:
        out["drop_attrs"] = drop_attrs
    f = r.get("filter")
    if isinstance(f, list):  # repeated filter blocks merge in order
        merged: dict = {}
        for blk in f:
            merged.update(blk)
        f = merged
    if f:
        if f.get("keys_keep"):
            out["keys_to_keep"] = list(f["keys_keep"])
        if f.get("keys_drop"):
            out["keys_to_drop"] = list(f["keys_drop"])
        if f.get("expression"):
            out["filter"] = f["expression"]
        if f.get("bbox"):
            out["bbox"] = [float(v) for v in f["bbox"]]
    return out


def config_to_spec(cfg: dict) -> dict:
    """Parsed HCL config -> job.run_job spec dict. ``globals { input {}
    output {} }`` merge into one spec-level globals dict (per-resource
    options override them anyway, PlanetResource.go:25-90)."""
    def as_list(v):
        if v is None:
            return []
        return v if isinstance(v, list) else [v]

    g = cfg.get("globals") or {}
    if isinstance(g, list):
        merged = {}
        for blk in g:
            merged.update(blk)
        g = merged
    gmap: dict = {}
    for section in ("input", "output"):
        sec = g.get(section)
        if sec:
            gmap.update(_map_resource(sec))
    spec = {
        "globals": gmap,
        "inputs": [_map_resource(r) for r in as_list(cfg.get("inputs"))],
        "outputs": [_map_resource(r) for r in as_list(cfg.get("outputs"))],
    }
    if cfg.get("context"):
        spec["context"] = cfg["context"]
    return spec


def load_hcl_spec(path: str) -> dict:
    """Read + parse + map an HCL job config (LoadConfig.go:15-44 expands
    ~ and requires a local file scheme — same here)."""
    import os
    from .sources.uri import split_uri
    scheme, p = split_uri(path)
    if scheme not in ("", "file"):
        raise ValueError(f"unsupported scheme for config uri {path!r}")
    with open(os.path.expanduser(p)) as f:
        return config_to_spec(parse_hcl(f.read()))
