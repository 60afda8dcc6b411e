"""Multimodal column stages — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns.
The Ray-side plumbing (schema, actor-pool stage shape, per-actor model
setup, small batch sizes for wide binary rows, output layout) is real
and tested; the actual codec is STUBBED because the sandbox ships no
image/audio libraries — each decoder raises NotImplementedError unless
constructed with the deterministic fake codec used by tests.

Scale notes baked into the stage defaults: binary rows are wide, so
``batch_size`` is small (64) and the actor pool bounds concurrent
decode memory; decoded features replace the payload column immediately
(the binary column never travels further down the pipeline).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

_FAKE_MAGIC = b"FAKEIMG1"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image codec: header + seeded byte pattern."""
    rng = np.random.RandomState(seed)
    body = rng.randint(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return _FAKE_MAGIC + struct.pack("<II", width, height) + body


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table for tests/benchmarks."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(encode_fake_image(w, h, seed + i))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class ImageDecoder:
    """Actor stage: decode + feature-extract image payloads.

    Real deployments pass ``codec="pillow"`` (model/codec loaded once
    per actor in __init__); this sandbox has no image libraries, so
    only the deterministic ``codec="fake"`` path is implemented and the
    real one raises NotImplementedError at construction — the stage
    shape (schema in/out, batching, actor pool) is identical either
    way."""

    def __init__(self, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires image libraries not present in "
                "this environment; use codec='fake'"
            )
        self.codec = codec

    def _decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(_FAKE_MAGIC):
            raise ValueError("bad fake-image magic")
        w, h = struct.unpack("<II", payload[8:16])
        return np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, phashes = [], [], []
        for payload in batch["payload"].to_pylist():
            img = self._decode(payload)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            phashes.append(
                int.from_bytes(hashlib.sha1(img.tobytes()).digest()[:8], "big")
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"],
                "height": batch["height"],
                "mean_intensity": pa.array(means, pa.float64()),
                "std_intensity": pa.array(stds, pa.float64()),
                "phash": pa.array(np.asarray(phashes, dtype=np.uint64)),
            }
        )


def decode_images(
    media_ds: ray.data.Dataset, codec: str = "fake", concurrency=(1, 4)
) -> ray.data.Dataset:
    """Feature-extraction stage over a media Dataset; drops the binary
    payload column in its output."""
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=64,  # wide binary rows → small batches
        concurrency=concurrency,
    )


class Resizer:
    """Actor stage stub for image resize: real codec unavailable; the
    fake path downsamples the deterministic byte grid by striding."""

    def __init__(self, target: int = 8, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError("resize requires image libraries; use fake codec")
        self.target = target
        self._decoder = ImageDecoder(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            img = self._decoder._decode(payload)
            sy = max(1, img.shape[0] // self.target)
            sx = max(1, img.shape[1] // self.target)
            small = img[::sy, ::sx][: self.target, : self.target]
            out.append(small.flatten().astype(np.float32) / 255.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "thumb": pa.array([v.tolist() for v in out], pa.list_(pa.float32())),
            }
        )


def resize_images(
    media_ds: ray.data.Dataset, target: int = 8, codec: str = "fake", concurrency=(1, 4)
) -> ray.data.Dataset:
    """Resize/thumbnail stage: actor pool (decoder state per actor),
    small batches for wide binary rows; output drops the payload and
    carries the normalized ``thumb`` vector (list<float32>) — the
    layout an embedding model would consume next."""
    return media_ds.map_batches(
        Resizer,
        fn_constructor_kwargs={"target": target, "codec": codec},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


_FAKE_AUDIO_MAGIC = b"FAKEAUD1"


def encode_fake_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Deterministic fake audio codec: header + seeded int16 PCM."""
    rng = np.random.RandomState(seed)
    body = rng.randint(-(1 << 14), 1 << 14, size=n_samples, dtype=np.int16).tobytes()
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", n_samples, sample_rate) + body


class AudioFeaturizer:
    """Actor stage: decode + feature-extract audio payloads (duration,
    RMS level, zero-crossing rate). Same stub discipline as
    ImageDecoder: only the deterministic ``codec="fake"`` path runs in
    this sandbox; a real codec (ffmpeg/soundfile) raises
    NotImplementedError at construction, with the stage shape —
    per-actor setup, small batches, payload dropped on output —
    unchanged."""

    def __init__(self, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires audio libraries not present in "
                "this environment; use codec='fake'"
            )

    def _decode(self, payload: bytes):
        if not payload.startswith(_FAKE_AUDIO_MAGIC):
            raise ValueError("bad fake-audio magic")
        n, sr = struct.unpack("<II", payload[8:16])
        pcm = np.frombuffer(payload[16 : 16 + 2 * n], dtype=np.int16)
        return pcm, sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rms, zcr = [], [], []
        for payload in batch["payload"].to_pylist():
            pcm, sr = self._decode(payload)
            x = pcm.astype(np.float64) / (1 << 15)
            durs.append(len(pcm) / max(1, sr))
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcr.append(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if len(x) > 1
                else 0.0
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
            }
        )


def featurize_audio(
    media_ds: ray.data.Dataset, codec: str = "fake", concurrency=(1, 4)
) -> ray.data.Dataset:
    return media_ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def synthesize_audio(n: int, seed: int = 7) -> pa.Table:
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        sr = 8000
        samples = sr * (1 + i % 3)
        rows["media_id"].append(i)
        rows["kind"].append("audio")
        rows["payload"].append(encode_fake_audio(samples, sr, seed + i))
        rows["width"].append(0)
        rows["height"].append(0)
        rows["sample_rate"].append(sr)
        rows["n_frames"].append(0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def frame_sample(media_ds: ray.data.Dataset, every_n: int = 2) -> ray.data.Dataset:
    """Media ROW-sampling stub: keeps every-nth media row (pushdown-
    friendly filter before any decode). For sampling frames INSIDE a
    video payload see :class:`VideoFrameSampler`."""

    def sample(batch: pa.Table) -> pa.Table:
        idx = [i for i, m in enumerate(batch["media_id"].to_pylist()) if m % every_n == 0]
        return batch.take(idx)

    return media_ds.map_batches(sample, batch_format="pyarrow")


_FAKE_VIDEO_MAGIC = b"FAKEVID1"


def encode_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake video codec: header + n_frames seeded
    grayscale planes in C order."""
    rng = np.random.RandomState(seed)
    body = rng.randint(
        0, 256, size=n_frames * width * height, dtype=np.uint8
    ).tobytes()
    return _FAKE_VIDEO_MAGIC + struct.pack("<III", width, height, n_frames) + body


def synthesize_videos(n: int, seed: int = 9) -> pa.Table:
    """Deterministic video table for tests/benchmarks: varying frame
    counts and plane sizes so every-nth sampling hits every remainder."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h = 8 + (i % 4) * 4, 8 + (i % 3) * 4
        nf = 4 + i % 7
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["payload"].append(encode_fake_video(w, h, nf, seed + i))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(nf)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class VideoFrameSampler:
    """Actor stage: decode a video payload, keep every-nth frame
    (first frame always kept), emit ONE ROW PER SAMPLED FRAME with
    per-frame features — the flat layout a frame-level embedding or
    caption model consumes next. Same stub discipline as ImageDecoder:
    only the deterministic ``codec="fake"`` path runs in this sandbox;
    a real codec (ffmpeg/decord) raises NotImplementedError at
    construction, the stage shape — per-actor setup, small batches for
    wide binary rows, payload dropped on output, row-expanding batch —
    is identical either way. Features are integers (pixel_sum, frame
    phash) so the op stays exactly oracle-able."""

    def __init__(self, every_n: int = 2, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires video libraries not present in "
                "this environment; use codec='fake'"
            )
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n

    def _decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(_FAKE_VIDEO_MAGIC):
            raise ValueError("bad fake-video magic")
        w, h, nf = struct.unpack("<III", payload[8:20])
        return np.frombuffer(
            payload[20 : 20 + nf * w * h], dtype=np.uint8
        ).reshape(nf, h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sums, phashes = [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames = self._decode(payload)
            keep = np.arange(0, frames.shape[0], self.every_n)
            flat = frames.reshape(frames.shape[0], -1)
            frame_sums = flat.sum(axis=1, dtype=np.int64)
            for fi in keep:
                ids.append(media_id)
                idxs.append(int(fi))
                sums.append(int(frame_sums[fi]))
                phashes.append(
                    int.from_bytes(
                        hashlib.sha1(flat[fi].tobytes()).digest()[:8], "big"
                    )
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "phash": pa.array(np.asarray(phashes, dtype=np.uint64)),
            }
        )


def sample_video_frames(
    media_ds: ray.data.Dataset,
    every_n: int = 2,
    codec: str = "fake",
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Frame-sampling + per-frame featurization stage: actor pool,
    small batches (video rows are the widest binary payloads), output
    is frame-level rows with the payload dropped."""
    return media_ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "codec": codec},
        batch_format="pyarrow",
        batch_size=16,  # video payloads are the widest rows
        concurrency=concurrency,
    )
