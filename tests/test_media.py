"""Audio/video stages: real Ray plumbing (schema, actor pools, byte-sized
batches, explode layout), stubbed decode (deterministic fake + strict
NotImplementedError mode)."""

import numpy as np
import pyarrow as pa
import pytest

from go_osm_ray.pipelines.media import (_bytes_batch_size, audio_features,
                                        video_frame_sample)


def _media_ds(rd, n=40):
    # opaque binary payloads: reuse the synthetic image bytes as stand-ins
    from go_osm_ray import datagen
    t = datagen.build_images_table(n)
    return rd.from_arrow(pa.table({
        "media_id": t["image_id"],
        "bytes": t["bytes"],
    }))


def test_audio_features_schema_and_determinism(ray_session):
    import ray.data as rd
    out1 = audio_features(_media_ds(rd), concurrency=2).to_pandas()
    out2 = audio_features(_media_ds(rd), concurrency=2).to_pandas()
    assert len(out1) == 40
    assert list(out1.columns) == ["media_id", "features"]
    assert all(len(f) == 13 for f in out1["features"])
    a = out1.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["features"], b["features"]):
        assert np.allclose(np.asarray(x), np.asarray(y))


def test_video_frame_sample_explode_layout(ray_session):
    import ray.data as rd
    out = video_frame_sample(_media_ds(rd), k=3, concurrency=2).to_pandas()
    assert len(out) == 40 * 3
    assert list(out.columns) == ["media_id", "frame_idx", "frame_bytes"]
    per = out.groupby("media_id")["frame_idx"].apply(sorted)
    assert all(list(v) == [0, 1, 2] for v in per)
    assert (out["frame_bytes"].str.len() > 0).all()


def test_strict_mode_raises(ray_session):
    import ray.data as rd
    with pytest.raises(Exception) as ei:
        audio_features(_media_ds(rd, 8), concurrency=1,
                       strict=True).to_pandas()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_bytes_batch_sizing():
    assert _bytes_batch_size(1 << 20) == 32          # 1 MB payloads -> 32 rows
    assert _bytes_batch_size(64 << 20) == 16         # floor
    assert _bytes_batch_size(1) > 1000               # tiny payloads -> big batches


def test_audio_silence_strict_raises(ray_session):
    """strict=True is the honest no-codec mode."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from go_osm_ray.pipelines.media import audio_silence_ratio
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["m0"], pa.string()),
        "bytes": pa.array([b"xx"], pa.binary())}))
    with pytest.raises(Exception):
        audio_silence_ratio(ds, strict=True, concurrency=1).take_all()


def test_video_shot_cuts_deterministic(ray_session):
    """Same payload -> identical cut counts across runs (deterministic
    fake decode); empty payload -> zero distance everywhere."""
    import pyarrow as pa
    import ray.data as rd

    from go_osm_ray.pipelines.media import video_shot_cuts
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["a", "b"], pa.string()),
        "bytes": pa.array([bytes(range(256)) * 4, b""], pa.binary())}))
    r1 = video_shot_cuts(ds, concurrency=1).to_pandas() \
        .set_index("media_id").sort_index()
    r2 = video_shot_cuts(ds, concurrency=1).to_pandas() \
        .set_index("media_id").sort_index()
    assert r1.equals(r2)
    assert r1.loc["b", "n_cuts"] == 0 and r1.loc["b", "max_d6"] == 0.0
