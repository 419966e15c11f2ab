"""Audio/video stages: real Ray plumbing (schema, actor pools, byte-sized
batches, explode layout), two-tier decode (deterministic fake default;
strict=True parses real RIFF/WAVE PCM and GFV1 frame containers)."""

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


def test_strict_mode_rejects_non_wav(ray_session):
    """strict=True decodes REAL containers only: non-RIFF payloads (the
    synthetic image bytes) fail loudly instead of faking a waveform."""
    import ray.data as rd
    with pytest.raises(Exception) as ei:
        audio_features(_media_ds(rd, 8), concurrency=1,
                       strict=True).to_pandas()
    assert "RIFF" in str(ei.value) or "ValueError" in str(ei.value)


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


# ------------------------------------------- round-5 real-container codecs


def test_wav_roundtrip_and_channel_mix():
    """encode_wav -> decode_wav reproduces the waveform to 16-bit
    quantization; a hand-built stereo WAV averages channels to mono."""
    import struct

    from go_osm_ray.pipelines.media import decode_wav, encode_wav
    sr = 8000
    t = np.arange(sr) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out, got_sr = decode_wav(encode_wav(wave, sr))
    assert got_sr == sr
    assert np.abs(out - wave).max() <= 1.5 / 32768

    # stereo: L = 0.5, R = -0.5 -> mono 0.0
    pcm = np.zeros(200, "<i2")
    pcm[0::2] = 16384
    pcm[1::2] = -16384
    fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm.tobytes()))
            + pcm.tobytes())
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    mono, _ = decode_wav(blob)
    assert len(mono) == 100
    assert np.abs(mono).max() < 1e-4


def test_wav_compressed_tag_raises():
    import struct

    from go_osm_ray.pipelines.media import decode_wav
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = mp3
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(blob)


def test_audio_silence_strict_on_real_wav(ray_session):
    """Half-silent WAV through the strict actor pool: 16 kHz, 1 s, first
    half zeros -> exactly half the 20 ms windows are silent."""
    import ray.data as rd

    from go_osm_ray.pipelines.media import audio_silence_ratio, encode_wav
    sr = 16000
    wave = np.zeros(sr, np.float32)
    wave[sr // 2:] = 0.5  # constant 0.5 -> window RMS 0.5 > 0.2
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["clip0"], pa.string()),
        "bytes": pa.array([encode_wav(wave, sr)], pa.binary())}))
    r = audio_silence_ratio(ds, strict=True, concurrency=1).take_all()[0]
    assert r["n_windows"] == 50
    assert r["n_silent"] == 25
    assert r["silence6"] == 0.5


def test_video_shot_cuts_strict_on_real_gfv(ray_session):
    """GFV1 with 4 black then 4 white frames -> exactly one cut with the
    maximum possible histogram L1 distance (2.0)."""
    import ray.data as rd

    from go_osm_ray.pipelines.media import encode_gfv, video_shot_cuts
    frames = np.zeros((8, 4, 4, 3), np.uint8)
    frames[4:] = 255
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([encode_gfv(frames)], pa.binary())}))
    r = video_shot_cuts(ds, strict=True, concurrency=1, k=8).take_all()[0]
    assert r["n_cuts"] == 1
    assert r["max_d6"] == 2.0


def test_video_frame_sample_strict_real_frames(ray_session):
    """Strict frame sampling returns the actual GFV1 frame bytes on the
    even schedule (12 frames, k=4 -> indices 0, 3, 7, 11)."""
    import ray.data as rd

    from go_osm_ray.pipelines.media import (decode_gfv_frame, encode_gfv,
                                            video_frame_sample)
    frames = np.stack([np.full((2, 3, 3), i, np.uint8) for i in range(12)])
    blob = encode_gfv(frames)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([blob], pa.binary())}))
    out = video_frame_sample(ds, k=4, strict=True, concurrency=1) \
        .to_pandas().sort_values("frame_idx")
    assert list(out["frame_idx"]) == [0, 1, 2, 3]
    got = [bytes(b) for b in out["frame_bytes"]]
    assert got == [decode_gfv_frame(blob, i) for i in (0, 3, 7, 11)]
