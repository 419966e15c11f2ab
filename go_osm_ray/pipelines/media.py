"""Audio/video multimodal stages: REAL Ray-side plumbing, STUBBED codecs.

This container ships no audio/video libraries, so the DSP/decode kernels
are stubs (round brief: "STUB the decode step behind a clearly-marked
NotImplementedError or a deterministic fake, and make the Ray-side
plumbing — schema, batch size, actor signature, output layout — real and
tested"). Everything around the stub is production-shaped:

* payloads are opaque ``binary`` columns with typed metadata;
* stages are actor-pool classes (codec/model state bound once per actor
  in ``__init__``, batch work in ``__call__``);
* batch sizes are set by BYTES, not rows (media payloads are wide);
* frame sampling emits one row per (clip, frame) — the explode shape a
  downstream image pipeline consumes directly.

Swap ``_decode_audio_stub`` / ``_decode_frame_stub`` for the real codec
call (ffmpeg/soundfile) when the libraries exist; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _decode_audio_stub(blob: bytes, sample_rate: int) -> np.ndarray:
    """STUB decode: deterministic fake waveform derived from the payload
    digest (1 s of samples). Real impl: soundfile/ffmpeg decode."""
    seed = int.from_bytes(hashlib.sha256(blob[:256]).digest()[:8], "big")
    rs = np.random.RandomState(seed % (2**32))
    return rs.uniform(-1.0, 1.0, sample_rate).astype(np.float32)


def _band_energies(wave: np.ndarray, n_bands: int) -> np.ndarray:
    """Per-band RMS energy of a waveform — shared PRIMITIVE between the
    actor-pool stage and the scalar python-oracle (pyoracle.py), so the
    float semantics are bit-identical on both sides and the oracle gate
    exercises the Ray plumbing (batching, pool, explode layout)."""
    bands = np.array_split(wave.astype(np.float64), n_bands)
    return np.array([float(np.sqrt((b ** 2).mean())) for b in bands],
                    np.float64)


def _decode_frame_stub(blob: bytes, frame_idx: int) -> bytes:
    """STUB frame extraction: deterministic byte window standing in for
    a decoded/re-encoded frame. Real impl: ffmpeg seek+decode."""
    if not blob:
        return b""
    n = len(blob)
    w = max(n // 16, 1)
    s = (frame_idx * w) % n
    return blob[s:s + w]


class AudioFeatureStage:
    """Actor-pool stage: audio bytes -> fixed-size feature vector.

    ``strict=True`` raises NotImplementedError on first use — the honest
    no-codec mode; default uses the deterministic fake so the pipeline
    shape is testable end-to-end."""

    def __init__(self, sample_rate: int = 16_000, n_bands: int = 13,
                 strict: bool = False):
        self.sample_rate = sample_rate
        self.n_bands = n_bands
        self.strict = strict
        # real impl: load DSP tables / model weights ONCE per actor here
        self.window = np.hanning(512).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg (not in container)")
        ids = batch["media_id"].to_pylist()
        out = []
        for blob in batch["bytes"].to_pylist():
            wave = _decode_audio_stub(blob, self.sample_rate)
            out.append(_band_energies(wave, self.n_bands).astype(np.float32))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "features": pa.array([o.tolist() for o in out],
                                 pa.list_(pa.float32(), self.n_bands)),
        })


class VideoFrameSampleStage:
    """Actor-pool stage: video bytes -> k sampled frame rows
    (media_id, frame_idx, frame_bytes) — the explode layout an image
    decode stage consumes."""

    def __init__(self, k: int = 4, strict: bool = False):
        self.k = k
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires ffmpeg (not in container)")
        ids, idxs, frames = [], [], []
        for mid, blob in zip(batch["media_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            for f in range(self.k):
                ids.append(mid)
                idxs.append(f)
                frames.append(_decode_frame_stub(blob, f))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_bytes": pa.array(frames, pa.binary()),
        })


def _bytes_batch_size(avg_payload_bytes: int,
                      target_batch_bytes: int = 32 << 20) -> int:
    """Batch size by BYTES: wide payloads get small row batches."""
    return max(16, target_batch_bytes // max(avg_payload_bytes, 1))


def audio_features(media: ray.data.Dataset, concurrency=None,
                   avg_payload_bytes: int = 1 << 20,
                   strict: bool = False) -> ray.data.Dataset:
    from ..util import default_pool
    return media.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=_bytes_batch_size(avg_payload_bytes),
        concurrency=concurrency or default_pool(24))


def video_frame_sample(media: ray.data.Dataset, k: int = 4,
                       concurrency=None,
                       avg_payload_bytes: int = 8 << 20,
                       strict: bool = False) -> ray.data.Dataset:
    from ..util import default_pool
    return media.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"k": k, "strict": strict},
        batch_format="pyarrow",
        batch_size=_bytes_batch_size(avg_payload_bytes),
        concurrency=concurrency or default_pool(24))


def _window_energies(wave: np.ndarray, win: int) -> np.ndarray:
    """Per-window RMS energies — shared PRIMITIVE between the VAD stage
    and the scalar pyoracle (the _band_energies precedent: identical
    float semantics both sides)."""
    n = (len(wave) // win) * win
    w = wave[:n].astype(np.float64).reshape(-1, win)
    return np.sqrt((w ** 2).mean(axis=1))


class AudioSilenceStage:
    """Actor-pool stage: audio bytes -> voice-activity summary
    (n_windows, n_silent, silence6) over fixed 20 ms windows — the
    silence-ratio curation screen (mostly-silent clips waste training
    compute; all-silent ones are corrupt). Stubbed decode per the
    media-stage contract; ``strict=True`` raises."""

    def __init__(self, sample_rate: int = 16_000, win_ms: int = 20,
                 threshold: float = 0.2, strict: bool = False):
        self.sample_rate = sample_rate
        self.win = sample_rate * win_ms // 1000
        self.threshold = threshold
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg (not in container)")
        from ..util import round_half_away
        ids = batch["media_id"].to_pylist()
        nw, ns, ratio = [], [], []
        for blob in batch["bytes"].to_pylist():
            wave = _decode_audio_stub(blob, self.sample_rate)
            e = _window_energies(wave, self.win)
            k = len(e)
            s = int((e < self.threshold).sum())
            nw.append(k)
            ns.append(s)
            ratio.append(float(round_half_away(
                np.float64(s / k if k else 0.0), 6)))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_windows": pa.array(nw, pa.int64()),
            "n_silent": pa.array(ns, pa.int64()),
            "silence6": pa.array(ratio, pa.float64())})


def audio_silence_ratio(media: ray.data.Dataset, concurrency=None,
                        avg_payload_bytes: int = 65536,
                        strict: bool = False) -> ray.data.Dataset:
    """(media_id, n_windows, n_silent, silence6): VAD-style silence
    ratio per clip — see AudioSilenceStage."""
    from ..util import default_pool
    return media.map_batches(
        AudioSilenceStage, fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=_bytes_batch_size(avg_payload_bytes),
        concurrency=concurrency or default_pool(24))


def _frame_signature(frame: bytes, bins: int = 16) -> np.ndarray:
    """Byte-histogram signature of a (stub-decoded) frame — shared
    PRIMITIVE with the pyoracle. Real impl: downscaled luma histogram."""
    if not frame:
        return np.zeros(bins, np.float64)
    b = np.frombuffer(frame, np.uint8) // (256 // bins)
    h = np.bincount(b, minlength=bins).astype(np.float64)
    return h / h.sum()


class VideoShotCutStage:
    """Actor-pool stage: video bytes -> shot-boundary count over k
    sampled frames (adjacent-frame signature L1 distance above
    ``threshold``) — the scene-cut density probe a frame-sampling
    policy reads (one-shot clips need fewer frames). Stubbed frame
    decode per the media-stage contract."""

    def __init__(self, k: int = 8, threshold: float = 0.5,
                 strict: bool = False):
        self.k = k
        self.threshold = threshold
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires ffmpeg (not in container)")
        from ..util import round_half_away
        ids = batch["media_id"].to_pylist()
        cuts, mx = [], []
        for blob in batch["bytes"].to_pylist():
            sigs = [_frame_signature(_decode_frame_stub(blob, f))
                    for f in range(self.k)]
            d = [float(np.abs(sigs[i + 1] - sigs[i]).sum())
                 for i in range(self.k - 1)]
            cuts.append(int(sum(1 for x in d if x > self.threshold)))
            mx.append(float(round_half_away(
                np.float64(max(d) if d else 0.0), 6)))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_cuts": pa.array(cuts, pa.int64()),
            "max_d6": pa.array(mx, pa.float64())})


def video_shot_cuts(media: ray.data.Dataset, concurrency=None,
                    avg_payload_bytes: int = 65536, k: int = 8,
                    strict: bool = False) -> ray.data.Dataset:
    """(media_id, n_cuts, max_d6): sampled-frame shot-boundary census —
    see VideoShotCutStage."""
    from ..util import default_pool
    return media.map_batches(
        VideoShotCutStage, fn_constructor_kwargs={"k": k,
                                                  "strict": strict},
        batch_format="pyarrow",
        batch_size=_bytes_batch_size(avg_payload_bytes),
        concurrency=concurrency or default_pool(24))
