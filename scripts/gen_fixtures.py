"""Generate golden-oracle parquet fixtures for registry queries whose
ground truth is deterministic but not ANSI-SQL-expressible (sha1/crc32
in the kernels). The driver's correctness gate runs at sf=0.01; these
fixtures give those queries a real value-hash comparison there instead
of a rows-only check.

INDEPENDENCE: every fixture is computed by a plain-Python
reimplementation in THIS file — struct/zlib/hashlib/math, no numpy, no
imports from ontograph_ray.stages — so a bug in the vectorized engine
kernels cannot cancel out of the comparison. Only the deterministic
*encoders* (the data source, equivalent to reading an input parquet)
are shared.

Usage: python scripts/gen_fixtures.py   (writes fixtures/*.parquet)
"""

from __future__ import annotations

import hashlib
import math
import os
import struct
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
SF001 = "/root/testdata/sf0.01"


# -- independent simhash (matches stages/dedup.SimHasher's contract:
#    64-bit = crc32(token) | crc32(reversed token)<<32, bit votes) -----------


def simhash_py(text: str) -> int:
    toks = text.split(" ")
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def gen_simhash_pairs(max_hamming: int = 2) -> str:
    """Brute-force ALL-pairs simhash near-dups over the sf0.01
    documents table. Valid as an EXACT oracle for
    simhash_near_dup_pairs(max_hamming<=3): 4-way 16-bit chunk banding
    has recall 1.0 by pigeonhole (hamming<=3 over 4 chunks forces one
    identical chunk), so banding and brute force produce the same
    set."""
    docs = pq.read_table(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    sigs = [simhash_py(t) for t in docs["text"].to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    srcs, dsts, hams = [], [], []
    for a in range(len(order) - 1):
        ia = order[a]
        for b in range(a + 1, len(order)):
            ib = order[b]
            d = bin(sigs[ia] ^ sigs[ib]).count("1")
            if d <= max_hamming:
                srcs.append(ids[ia])
                dsts.append(ids[ib])
                hams.append(d)
    path = os.path.join(FIXTURES_DIR, "simhash_pairs_sf001_h2.parquet")
    pq.write_table(
        pa.table(
            {
                "src_id": pa.array(srcs, pa.int64()),
                "dst_id": pa.array(dsts, pa.int64()),
                "hamming": pa.array(hams, pa.int64()),
            }
        ),
        path,
    )
    return f"{path}: {len(srcs)} pairs"


# -- independent fake-image features ----------------------------------------


def gen_multimodal_features(n: int = 200) -> str:
    from ontograph_ray.stages.multimodal import encode_fake_image  # encoder only

    media_ids, widths, heights, phashes = [], [], [], []
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4  # synthesize_media's shape
        payload = encode_fake_image(w, h, 42 + i)
        pw, ph = struct.unpack("<II", payload[8:16])
        assert (pw, ph) == (w, h)
        body = payload[16 : 16 + w * h]
        media_ids.append(i)
        widths.append(w)
        heights.append(h)
        # the decoder's reshape(h, w).tobytes() is byte-identical to
        # the body (C order), so the phash is sha1 over the raw body
        phashes.append(int.from_bytes(hashlib.sha1(body).digest()[:8], "big"))
    path = os.path.join(FIXTURES_DIR, "multimodal_features_n200.parquet")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "phash": pa.array(phashes, pa.uint64()),
            }
        ),
        path,
    )
    return f"{path}: {n} rows"


# -- independent fake-audio features ----------------------------------------


def gen_audio_features(n: int = 200) -> str:
    from ontograph_ray.stages.multimodal import encode_fake_audio  # encoder only

    media_ids, durs, rmss, zcrs = [], [], [], []
    for i in range(n):
        sr = 8000
        samples = sr * (1 + i % 3)  # synthesize_audio's shape
        payload = encode_fake_audio(samples, sr, 7 + i)
        pn, psr = struct.unpack("<II", payload[8:16])
        assert (pn, psr) == (samples, sr)
        pcm = struct.unpack(f"<{pn}h", payload[16 : 16 + 2 * pn])
        x = [s / 32768.0 for s in pcm]
        media_ids.append(i)
        durs.append(round(pn / sr, 9))
        rmss.append(round(math.sqrt(math.fsum(v * v for v in x) / len(x)), 9))
        flips = sum(1 for a, b in zip(x[1:], x[:-1]) if (a < 0) != (b < 0))
        zcrs.append(round(flips / (len(x) - 1), 9))
    path = os.path.join(FIXTURES_DIR, "audio_features_n200.parquet")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_crossing_rate": pa.array(zcrs, pa.float64()),
            }
        ),
        path,
    )
    return f"{path}: {n} rows"


if __name__ == "__main__":
    os.makedirs(FIXTURES_DIR, exist_ok=True)
    print(gen_simhash_pairs())
    print(gen_multimodal_features())
    print(gen_audio_features())
