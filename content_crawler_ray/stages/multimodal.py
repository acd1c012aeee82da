"""Multimodal (image/audio/video) actor-pool stages.

The corpus carries opaque ``binary`` payloads with typed metadata
(w/h/fmt — BASELINE.json input_hint). The in-sandbox codecs (``raw``,
``dctq``) decode for real via functions/codecs; foreign formats (jpeg/png/
webp, audio, video) have no decoder wheels in this container, so those paths
are STUBBED behind clearly-marked NotImplementedError — but the Ray-side
plumbing (schema, actor signature, batch sizing, output layout) is real and
tested (SURVEY.md instruction: stub the codec, keep the pipeline honest).

Batch sizing note: rows are binary-heavy — callers pass a small
``batch_size`` (512 by default in q_image_stats) so batch × concurrency
stays inside a worker heap; blocks remain zero-copy Arrow throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs

KNOWN_FORMATS = ("raw", "dctq")


class DecodeStats:
    """Decode each image and emit per-row quality stats (PSNR vs the
    deterministic original, recomputed phash). Actor pool: nothing heavy to
    init here, but the class form keeps the slot where a real decoder pool
    (libjpeg handles, GPU contexts) would warm up once per worker."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        phs = batch["phash"].to_numpy(zero_copy_only=False)
        n = len(ids)
        psnr_e3 = np.zeros(n, dtype=np.int64)
        phash_ok = np.zeros(n, dtype=bool)
        for i in range(n):
            decoded = decode_image(blobs[i], int(ws[i]), int(hs[i]), fmts[i])
            if fmts[i] == "raw":  # lossless → PSNR is the cap by definition
                psnr_e3[i] = 99_000
            else:
                orig = codecs.gen_pixels(ids[i], int(ws[i]), int(hs[i]))
                psnr_e3[i] = int(np.floor(codecs.psnr(decoded, orig) * 1000))
            phash_ok[i] = codecs.phash64(decoded) == int(phs[i])
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "w": batch["w"],
                "h": batch["h"],
                "psnr_e3": pa.array(psnr_e3, pa.int64()),
                "phash_ok": pa.array(phash_ok, pa.bool_()),
            }
        )


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Dispatch decode; foreign formats raise (production: PIL/libjpeg here)."""
    if fmt in KNOWN_FORMATS:
        return codecs.decode(data, w, h, fmt)
    raise NotImplementedError(
        f"no decoder for fmt={fmt!r} in this container (production: PIL/ffmpeg)"
    )


class ResizeStage:
    """Deterministic area-pool resize to (target × target) grayscale; the
    real-world analog (bilinear via PIL) is a drop-in for _pool_to."""

    def __init__(self, target: int = 32):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        out = []
        for i in range(len(blobs)):
            px = decode_image(blobs[i], int(ws[i]), int(hs[i]), fmts[i])
            small = codecs._pool_to(px, self.target)
            out.append(np.clip(np.round(small), 0, 255).astype(np.uint8).tobytes())
        t = batch.select(["image_id"])
        t = t.append_column("thumb", pa.array(out, pa.binary()))
        t = t.append_column(
            "thumb_w", pa.array([self.target] * len(out), pa.int32())
        )
        return t.append_column("thumb_h", pa.array([self.target] * len(out), pa.int32()))


# Deterministic in-sandbox video container ("rawvid"): a 16-byte header
# (magic, n_frames, w, h) followed by n_frames raw uint8 grayscale frames.
# It stands in for mp4/webm exactly as the raw/dctq codecs stand in for
# jpeg: the container parse, frame stride math and per-frame payload slicing
# are REAL; only the foreign-codec branch stays a stub.
_RAWVID_MAGIC = b"RVID"


def synth_video_clip(video_id: int, n_frames: int = 24, w: int = 16, h: int = 16) -> bytes:
    """Deterministic rawvid clip: frame k = gen_pixels of (id, k) — drifting
    deterministic noise, the video analog of codecs.gen_pixels."""
    frames = [
        codecs.gen_pixels(f"vid-{video_id}-f{k}", w, h).tobytes() for k in range(n_frames)
    ]
    header = _RAWVID_MAGIC + np.array([n_frames, w, h], dtype="<i4").tobytes()
    return header + b"".join(frames)


def sample_frames(data: bytes, fmt: str, every_n: int = 10) -> list[bytes]:
    """Video frame sampling: binary clip → every-n-th raw frame payload.
    Real for the deterministic ``rawvid`` container (header parse + stride
    slicing); foreign codecs (mp4/webm) are honest stubs — a production
    ffmpeg-backed decoder fills the same contract."""
    if fmt == "rawvid":
        if data[:4] != _RAWVID_MAGIC:
            raise ValueError("corrupt rawvid header")
        n_frames, w, h = np.frombuffer(data[4:16], dtype="<i4")
        stride = int(w) * int(h)
        body = data[16:]
        return [
            body[k * stride : (k + 1) * stride] for k in range(0, int(n_frames), every_n)
        ]
    raise NotImplementedError("video codec unavailable in-sandbox (ffmpeg would plug in here)")


class FrameSample:
    """Actor-pool stage: video batch → one row per sampled frame, with the
    frame payload as a binary column plus per-frame mean luma (the fake
    'feature' downstream stages would consume). Binary-heavy: callers pass a
    small batch_size, frames never concatenate across rows."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out_id, out_k, out_frame, out_luma = [], [], [], []
        for i in range(len(ids)):
            frames = sample_frames(blobs[i], fmts[i], self.every_n)
            for k, payload in enumerate(frames):
                out_id.append(int(ids[i]))
                out_k.append(k * self.every_n)
                out_frame.append(payload)
                arr = np.frombuffer(payload, dtype=np.uint8)
                out_luma.append(int(np.floor(1e3 * float(arr.mean()))) if len(arr) else 0)
        return pa.table(
            {
                "video_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_k, pa.int64()),
                "frame": pa.array(out_frame, pa.binary()),
                "mean_luma_e3": pa.array(out_luma, pa.int64()),
            }
        )


# --------------------------------------------------------------------------
# Audio — opaque binary payloads (PCM s16le) with typed metadata, the audio
# leg of the multimodal contract. Raw PCM decodes for real (pure numpy);
# compressed audio (mp3/ogg/flac) has no codec wheel in this container and
# is stubbed exactly like jpeg/video above.
# --------------------------------------------------------------------------

AUDIO_FORMATS = ("pcm_s16le",)


def synth_audio_clip(audio_id: int, sr: int = 16_000, seconds: float = 0.5) -> bytes:
    """Deterministic PCM s16le clip: a 3-sine mixture whose frequencies and
    amplitudes derive from the id (the audio analog of codecs.gen_pixels)."""
    rng = np.random.Generator(np.random.PCG64(audio_id))
    n = int(sr * seconds)
    t = np.arange(n, dtype=np.float64) / sr
    sig = np.zeros(n)
    for _ in range(3):
        f = float(rng.integers(80, 4000))
        a = float(rng.uniform(0.1, 0.3))
        sig += a * np.sin(2 * np.pi * f * t)
    return (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes()


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """binary → float64 waveform in [-1, 1]. Real for raw PCM; compressed
    formats are honest stubs (no codec wheels in-sandbox)."""
    if fmt == "pcm_s16le":
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    raise NotImplementedError(
        f"audio codec {fmt!r} unavailable in-sandbox (libsndfile/ffmpeg would plug in here)"
    )


class AudioFeatures:
    """Actor-pool stage: audio batch → per-clip features, all vectorized
    numpy per clip (RMS energy, zero-crossing count, peak, spectral centroid
    via one rfft). Integer-scaled outputs (e6/e3) so cross-run comparison is
    exact. The class form keeps the warm-up slot for a real decoder pool."""

    def __init__(self, sr: int = 16_000):
        self.sr = sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        n = len(ids)
        n_samples = np.zeros(n, dtype=np.int64)
        rms_e6 = np.zeros(n, dtype=np.int64)
        zcr = np.zeros(n, dtype=np.int64)
        peak_e6 = np.zeros(n, dtype=np.int64)
        centroid_e3 = np.zeros(n, dtype=np.int64)
        for i in range(n):
            w = decode_audio(blobs[i], fmts[i])
            n_samples[i] = len(w)
            if not len(w):
                continue
            rms_e6[i] = int(np.floor(1e6 * np.sqrt(np.mean(w * w))))
            zcr[i] = int(np.count_nonzero(np.signbit(w[1:]) != np.signbit(w[:-1])))
            peak_e6[i] = int(np.floor(1e6 * np.abs(w).max()))
            spec = np.abs(np.fft.rfft(w))
            freqs = np.fft.rfftfreq(len(w), d=1.0 / self.sr)
            denom = spec.sum()
            if denom > 0:
                centroid_e3[i] = int(np.floor(1e3 * float((spec * freqs).sum() / denom)))
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "n_samples": pa.array(n_samples, pa.int64()),
                "rms_e6": pa.array(rms_e6, pa.int64()),
                "zero_crossings": pa.array(zcr, pa.int64()),
                "peak_e6": pa.array(peak_e6, pa.int64()),
                "centroid_hz_e3": pa.array(centroid_e3, pa.int64()),
            }
        )
