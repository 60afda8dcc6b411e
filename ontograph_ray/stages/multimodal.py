"""Multimodal column stages — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns.
The Ray-side plumbing (schema, actor-pool stage shape, per-actor model
setup, small batch sizes for wide binary rows, output layout) is real
and tested. Codecs come in three tiers:

- REAL uncompressed container formats, decoded here with no external
  libraries: ``codec="pgm"`` (binary PGM / Netpbm P5 images),
  ``codec="wav"`` (RIFF/WAVE PCM16 audio, stdlib ``wave``), and
  ``codec="y4m"`` (YUV4MPEG2 mono video streams). These are genuine
  on-disk formats a user can produce with ImageMagick / ffmpeg
  (`ffmpeg -pix_fmt gray -f yuv4mpegpipe`), so the decode stages are
  real codecs, not stubs.
- the deterministic ``codec="fake"`` header+bytes format kept for the
  original fixture twins.
- compressed formats (JPEG/PNG/MP3/H.264 — ``codec="pillow"`` /
  ``"ffmpeg"``) still raise NotImplementedError at construction: the
  sandbox ships no compression codecs and we do not fake them.

Scale notes baked into the stage defaults: binary rows are wide, so
``batch_size`` is small (64) and the actor pool bounds concurrent
decode memory; decoded features replace the payload column immediately
(the binary column never travels further down the pipeline).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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


def _image_pixels(width: int, height: int, seed: int) -> np.ndarray:
    """Deterministic grayscale pixel grid shared by every image codec."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=width * height, dtype=np.uint8)


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image codec: header + seeded byte pattern."""
    body = _image_pixels(width, height, seed).tobytes()
    return _FAKE_MAGIC + struct.pack("<II", width, height) + body


def encode_pgm_image(width: int, height: int, seed: int) -> bytes:
    """REAL codec: binary PGM (Netpbm P5, 8-bit grayscale) — the format
    `convert img.png img.pgm` emits. Header is ASCII (magic, dims,
    maxval), body is raw row-major bytes."""
    body = _image_pixels(width, height, seed).tobytes()
    return b"P5\n# ontograph_ray synthetic\n%d %d\n255\n" % (width, height) + body


def decode_pgm(payload: bytes) -> np.ndarray:
    """Parse a binary PGM (P5) payload → uint8 array (height, width).
    Handles the full Netpbm header grammar: '#' comments and arbitrary
    whitespace between the four header tokens."""
    if payload[:2] != b"P5":
        raise ValueError("bad PGM magic (want P5)")
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        c = payload[pos : pos + 1]
        if c == b"#":  # comment runs to end of line
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while not payload[end : end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only 8-bit PGM supported (maxval {maxval})")
    pos += 1  # single whitespace byte after maxval, then raw body
    return np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8).reshape(h, w)


def synthesize_media(n: int, seed: int = 42, codec: str = "fake") -> pa.Table:
    """Deterministic media table for tests/benchmarks. ``codec="pgm"``
    emits real binary-PGM payloads; ``"fake"`` the original header+bytes
    format. Pixel content is identical for a given (dims, seed)."""
    enc = {"fake": encode_fake_image, "pgm": encode_pgm_image}[codec]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(enc(w, h, seed + i))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class ImageDecoder:
    """Actor stage: decode + feature-extract image payloads.

    ``codec="pgm"`` decodes REAL binary-PGM (Netpbm P5) payloads with
    the in-module pure-numpy parser; ``codec="fake"`` the deterministic
    test format. Compressed codecs (``"pillow"``/JPEG/PNG) raise
    NotImplementedError at construction — the sandbox ships no
    compression libraries — with the stage shape (schema in/out,
    batching, actor pool) identical across codecs."""

    def __init__(self, codec: str = "fake"):
        if codec not in ("fake", "pgm"):
            raise NotImplementedError(
                f"codec {codec!r} requires image-compression libraries not "
                "present in this environment; use codec='pgm' or 'fake'"
            )
        self.codec = codec

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.codec == "pgm":
            return decode_pgm(payload)
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
    """Actor stage for image resize (strided downsample to a
    ``target``×``target`` thumbnail). Decodes through
    :class:`ImageDecoder`, so it accepts the same codecs ("pgm" real,
    "fake" test; compressed formats refused there)."""

    def __init__(self, target: int = 8, codec: str = "fake"):
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


def _audio_pcm(n_samples: int, seed: int) -> np.ndarray:
    """Deterministic int16 PCM content shared by every audio codec."""
    rng = np.random.RandomState(seed)
    return rng.randint(-(1 << 14), 1 << 14, size=n_samples, dtype=np.int16)


def encode_fake_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Deterministic fake audio codec: header + seeded int16 PCM."""
    body = _audio_pcm(n_samples, seed).tobytes()
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", n_samples, sample_rate) + body


def encode_wav_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """REAL codec: RIFF/WAVE container, mono 16-bit little-endian PCM,
    written with stdlib ``wave`` — byte-for-byte what `ffmpeg -f wav`
    or `sox` produce for uncompressed mono PCM16."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(_audio_pcm(n_samples, seed).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE payload → (int16 PCM array, sample_rate).
    Mono PCM16 only (the uncompressed norm); stdlib ``wave`` handles
    the RIFF chunk walk."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"only mono PCM16 WAV supported (got {w.getnchannels()}ch "
                f"{8 * w.getsampwidth()}-bit)"
            )
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return pcm, sr


class AudioFeaturizer:
    """Actor stage: decode + feature-extract audio payloads (duration,
    RMS level, zero-crossing rate). ``codec="wav"`` decodes REAL
    RIFF/WAVE PCM16 via stdlib ``wave``; ``"fake"`` the deterministic
    test format. Compressed codecs (MP3/OGG — ``"ffmpeg"``) raise
    NotImplementedError at construction, with the stage shape —
    per-actor setup, small batches, payload dropped on output —
    unchanged."""

    def __init__(self, codec: str = "fake"):
        if codec not in ("fake", "wav"):
            raise NotImplementedError(
                f"codec {codec!r} requires audio-compression libraries not "
                "present in this environment; use codec='wav' or 'fake'"
            )
        self.codec = codec

    def _decode(self, payload: bytes):
        if self.codec == "wav":
            return decode_wav(payload)
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


def synthesize_audio(n: int, seed: int = 7, codec: str = "fake") -> pa.Table:
    enc = {"fake": encode_fake_audio, "wav": encode_wav_audio}[codec]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        sr = 8000
        samples = sr * (1 + i % 3)
        rows["media_id"].append(i)
        rows["kind"].append("audio")
        rows["payload"].append(enc(samples, sr, seed + i))
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


def _video_planes(width: int, height: int, n_frames: int, seed: int) -> np.ndarray:
    """Deterministic grayscale frame planes shared by every video codec."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=n_frames * width * height, dtype=np.uint8)


def encode_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake video codec: header + n_frames seeded
    grayscale planes in C order."""
    body = _video_planes(width, height, n_frames, seed).tobytes()
    return _FAKE_VIDEO_MAGIC + struct.pack("<III", width, height, n_frames) + body


def encode_y4m_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """REAL codec: YUV4MPEG2 stream (``Cmono`` = 8-bit grayscale, one
    luma plane per frame) — what `ffmpeg -pix_fmt gray -f yuv4mpegpipe`
    emits. ASCII stream header, then per-frame ``FRAME\\n`` marker +
    raw plane."""
    planes = _video_planes(width, height, n_frames, seed)
    plane = width * height
    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 Cmono\n" % (width, height)]
    for fi in range(n_frames):
        parts.append(b"FRAME\n")
        parts.append(planes[fi * plane : (fi + 1) * plane].tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Parse a YUV4MPEG2 mono stream → uint8 array (n_frames, h, w).
    Handles the full stream-header grammar (space-separated tagged
    params) and optional per-FRAME params."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("bad YUV4MPEG2 magic")
    w = h = 0
    cspace = b"420jpeg"  # the spec default when C is absent
    for tag in header[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            cspace = tag[1:]
    if cspace != b"mono":
        raise ValueError(f"only Cmono y4m supported (got C{cspace.decode()})")
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    plane, pos, frames = w * h, nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # skip optional frame params
        frames.append(np.frombuffer(payload[pos : pos + plane], dtype=np.uint8))
        pos += plane
    return np.stack(frames).reshape(len(frames), h, w)


def synthesize_videos(n: int, seed: int = 9, codec: str = "fake") -> pa.Table:
    """Deterministic video table for tests/benchmarks: varying frame
    counts and plane sizes so every-nth sampling hits every remainder.
    ``codec="y4m"`` emits real YUV4MPEG2 streams."""
    enc = {"fake": encode_fake_video, "y4m": encode_y4m_video}[codec]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        w, h = 8 + (i % 4) * 4, 8 + (i % 3) * 4
        nf = 4 + i % 7
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["payload"].append(enc(w, h, nf, seed + i))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(0)
        rows["n_frames"].append(nf)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class VideoFrameSampler:
    """Actor stage: decode a video payload, keep every-nth frame
    (first frame always kept), emit ONE ROW PER SAMPLED FRAME with
    per-frame features — the flat layout a frame-level embedding or
    caption model consumes next. ``codec="y4m"`` decodes REAL
    YUV4MPEG2 mono streams with the in-module parser; ``"fake"`` the
    deterministic test format. Compressed codecs (H.264 —
    ``"ffmpeg"``/``"decord"``) raise NotImplementedError at
    construction, the stage shape — per-actor setup, small batches for
    wide binary rows, payload dropped on output, row-expanding batch —
    is identical either way. Features are integers (pixel_sum, frame
    phash) so the op stays exactly oracle-able."""

    def __init__(self, every_n: int = 2, codec: str = "fake"):
        if codec not in ("fake", "y4m"):
            raise NotImplementedError(
                f"codec {codec!r} requires video-compression libraries not "
                "present in this environment; use codec='y4m' or 'fake'"
            )
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        self.codec = codec

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.codec == "y4m":
            return decode_y4m(payload)
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
