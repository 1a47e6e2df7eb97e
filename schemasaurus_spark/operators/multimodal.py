"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. The sandbox has no image/audio codecs,
so the decode kernels are STUBS — a deterministic fake keyed on the payload
bytes behind ``decoder=`` (and ``NotImplementedError`` for the real ones) —
while everything Spark-side (schema, batch shape, partition sizing, UDF
signature) is real and tested.

Scale notes: payload columns are heavy — the pipeline projects
(id, payload) only (column pruning keeps siblings out of the Arrow
transfer), and ``repartition_for_payloads`` sizes partitions by estimated
bytes so one Arrow batch never exceeds executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = (
    "id long, n_bytes long, sha1 string, feat array<float>"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Test fixture: deterministic binary payload derived from text + a
    metadata struct — stands in for real image bytes."""
    payload = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake/raw").alias("codec"),
        (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return df.select(F.col(id_col).cast("long").alias("id"),
                     payload.alias("payload"), meta.alias("media"))


def _stub_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: 8 float features from the sha1 digest.
    Real codec integration replaces ONLY this function."""
    h = hashlib.sha1(payload).digest()
    return np.frombuffer(h[:16], dtype=np.uint8).reshape(2, 8).mean(axis=0) / 255.0


def _sniff_decode(payload: bytes) -> np.ndarray:
    """Default decoder: real parse for containers we can decode without
    codec libs (BMP/WAV), deterministic stub otherwise. Sniffing goes
    through decode_media_info, so a payload whose MAGIC matches but whose
    header is truncated/malformed falls to the stub instead of crashing
    the task (corrupt rows are features, never job failures). VARIANT
    gating matters too (round-4 review): a float32/stereo WAV or a
    palettized/compressed BMP passes the magic sniff but would be parsed
    as PCM16-mono / 24-bit-uncompressed into garbage features — those
    route to the stub, like every other unsupported payload."""
    info = decode_media_info(payload)
    if info["kind"] != "unknown" and _variant_decodable(payload, info):
        return real_decode(payload, info)
    return _stub_decode(payload or b"")


def _variant_decodable(payload: bytes, info: dict) -> bool:
    """True iff the payload is the exact variant real_decode implements:
    24-bit uncompressed BMP (biBitCount=24, biCompression=0) or PCM16
    mono WAV (audio_format=1, bits=16, channels=1)."""
    try:
        if info["kind"] == "bmp":
            if len(payload) < 34:
                return False
            bit_count = struct.unpack_from("<H", payload, 28)[0]
            compression = struct.unpack_from("<I", payload, 30)[0]
            return bit_count == 24 and compression == 0
        if info["kind"] == "wav":
            fmt = _wav_chunks(payload).get(b"fmt ")
            if fmt is None:
                return False
            off = fmt[0]
            audio_format = struct.unpack_from("<H", payload, off)[0]
            channels = struct.unpack_from("<H", payload, off + 2)[0]
            bits = struct.unpack_from("<H", payload, off + 14)[0]
            return audio_format == 1 and bits == 16 and channels == 1
    except (struct.error, IndexError):
        return False
    return False


def real_decode(payload: bytes, info: dict | None = None) -> np.ndarray:
    """Real decode for the containers parseable WITHOUT codec libraries:
    uncompressed 24-bit BMP and PCM16 mono WAV (pure struct/numpy header +
    sample parsing). Other containers (JPEG/PNG/MP3/...) still raise —
    inject a codec via ``extract_features(decoder=...)``. ``info`` skips a
    second header parse when the caller already sniffed (the hot Arrow
    kernel path)."""
    info = info if info is not None else decode_media_info(payload)
    if info["kind"] == "bmp":
        px = _bmp_pixels(payload).astype(np.float64) / 255.0
        if px.size == 0:  # header ok but pixel data truncated away
            return _stub_decode(payload)
        return np.array([
            info["width"] / 1024.0, info["height"] / 1024.0,
            px[..., 2].mean(), px[..., 1].mean(), px[..., 0].mean(),
            px.std(), px.min(), px.max(),
        ])
    if info["kind"] == "wav":
        x = _wav_samples(payload).astype(np.float64) / 32768.0
        if len(x) == 0:
            return _stub_decode(payload)
        zc = np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))) if len(x) > 1 else 0.0
        return np.array([
            info["sample_rate"] / 48000.0, len(x) / 1e6,
            float(np.sqrt((x ** 2).mean())), float(zc),
            float(x.mean()), float(x.max()), float(x.min()),
            len(x) / max(info["sample_rate"], 1),
        ])
    raise NotImplementedError(
        f"no codec for container {payload[:4]!r}; "
        "inject a decoder via extract_features(decoder=...)")


# -- real containers: BMP (24-bit uncompressed) + WAV (PCM16) ----------------
# Deterministic mini-files for fixtures and pure-numpy header/sample parsing
# — real decode paths with no codec dependency.

import struct


def make_bmp(width: int, height: int, seed: int) -> bytes:
    """Deterministic uncompressed 24-bit BMP: pixel value (seed*31 + i) % 256
    repeated across BGR. Bottom-up rows, 4-byte padded — the real format."""
    row_bytes = (width * 3 + 3) & ~3
    data = bytearray()
    i = 0
    for _ in range(height):
        row = bytearray()
        for _ in range(width):
            v = (seed * 31 + i) % 256
            row += bytes((v, v, v))
            i += 1
        row += b"\x00" * (row_bytes - len(row))
        data += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    return bytes(header + dib + data)


def make_wav(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic PCM16 mono WAV: sample i = ((seed*7 + i) % 200 - 100) * 300."""
    x = ((np.arange(n_samples) + seed * 7) % 200 - 100) * 300
    samples = x.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


_UNKNOWN_INFO = {"kind": "unknown", "width": None, "height": None,
                 "sample_rate": None, "n_samples": None}


def _wav_chunks(payload: bytes) -> dict:
    """Walk RIFF sub-chunks → {chunk_id: (body_offset, size)}. Real-world
    WAVs carry fmt extensions (cbSize) and extra chunks (LIST/INFO/fact)
    between fmt and data — fixed 44-byte offsets read garbage there. A
    chunk running past the buffer is clipped to the available bytes."""
    out: dict = {}
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > n:
            out[cid] = (body, max(0, n - body))
            break
        out[cid] = (body, size)
        pos = body + size + (size & 1)  # chunks are word-aligned
    return out


def decode_media_info(payload) -> dict:
    """Container sniff + header parse (no pixel/sample read): the metadata a
    100 TB pipeline extracts in its first cheap pass. NULL/truncated/
    malformed payloads return kind='unknown' — one corrupt row must become
    a feature value, never a failed task (x4 retries → failed job)."""
    if payload is None:
        return dict(_UNKNOWN_INFO)
    payload = bytes(payload)
    if payload[:2] == b"BM":
        if len(payload) < 26:
            return dict(_UNKNOWN_INFO)
        w, h = struct.unpack_from("<ii", payload, 18)
        if w <= 0 or h == 0:
            return dict(_UNKNOWN_INFO)
        return {"kind": "bmp", "width": w, "height": abs(h),
                "sample_rate": None, "n_samples": None}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        ch = _wav_chunks(payload)
        fmt = ch.get(b"fmt ")
        data = ch.get(b"data")
        if fmt is None or fmt[1] < 16 or data is None:
            return dict(_UNKNOWN_INFO)
        off = fmt[0]
        channels = struct.unpack_from("<H", payload, off + 2)[0]
        sr = struct.unpack_from("<I", payload, off + 4)[0]
        bits = struct.unpack_from("<H", payload, off + 14)[0]
        n = data[1] // max(1, (bits // 8) * channels)
        return {"kind": "wav", "width": None, "height": None,
                "sample_rate": sr, "n_samples": n}
    return dict(_UNKNOWN_INFO)


def _bmp_pixels(payload: bytes) -> np.ndarray:
    """(height, width, 3) BGR array from an uncompressed 24-bit BMP.
    Truncated pixel data clips to the fully-present rows."""
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    h = min(h, max(0, (len(payload) - off) // max(row_bytes, 1)))
    rows = [np.frombuffer(payload, dtype=np.uint8,
                          count=w * 3, offset=off + r * row_bytes).reshape(w, 3)
            for r in range(h)]
    if not rows:
        return np.zeros((0, w, 3), dtype=np.uint8)
    return np.stack(rows[::-1])  # bottom-up storage → top-down array


def _wav_samples(payload: bytes) -> np.ndarray:
    """PCM16 samples via the chunk walker (see _wav_chunks — fixed 44-byte
    offsets break on fmt extensions / extra chunks)."""
    data = _wav_chunks(payload).get(b"data")
    if data is None:
        return np.zeros(0, dtype="<i2")
    off, size = data
    return np.frombuffer(payload, dtype="<i2", count=size // 2, offset=off)


def attach_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture: REAL container payloads generated deterministically from the
    id — BMP for even ids, WAV for odd. Generation runs in the Arrow kernel
    (executor-side), never on the driver. The id projection is widened to
    cluster width first (round 6): every downstream decode/feature kernel
    inherits this partitioning, and a 2-row-group fixture scan otherwise
    serializes all three Arrow stages onto 2 cores."""
    from schemasaurus_spark.operators import spread_scan
    slim = spread_scan(df).select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_bmp(4 + i % 13, 4 + i % 7, i) if i % 2 == 0
                else make_wav(8000 + (i % 5) * 1000, 100 + i % 50, i)
                for i in pdf["id"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    return slim.mapInPandas(kernel, "id long, payload binary")


MEDIA_INFO_SCHEMA = ("id long, kind string, width int, height int, "
                     "sample_rate int, n_samples int")


def extract_media_info(media_df: DataFrame) -> DataFrame:
    """Header-parse pass over (id, payload) — Arrow-batched, pure struct
    unpacking, no codec libs."""
    slim = media_df.select("id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            infos = [decode_media_info(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "id": pdf["id"],
                "kind": [i["kind"] for i in infos],
                "width": pd.array([i["width"] for i in infos], dtype="Int32"),
                "height": pd.array([i["height"] for i in infos], dtype="Int32"),
                "sample_rate": pd.array([i["sample_rate"] for i in infos], dtype="Int32"),
                "n_samples": pd.array([i["n_samples"] for i in infos], dtype="Int32"),
            })

    return slim.mapInPandas(kernel, MEDIA_INFO_SCHEMA)


def extract_features(media_df: DataFrame, decoder=None,
                     batch_hint_bytes: int = 64 << 20) -> DataFrame:
    """Arrow-batched feature extraction over (id, payload).

    The mapInPandas kernel sees pandas batches; per-element decode happens
    in numpy/PIL-land (vectorizable), never via Spark row UDFs."""
    decoder = decoder or _sniff_decode
    slim = media_df.select("id", "payload")  # column pruning: no metadata/tail

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [b"" if p is None else bytes(p)
                        for p in pdf["payload"]]  # NULL payload = empty
            feats = [decoder(p) for p in payloads]
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
                "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
                "feat": [np.asarray(f, dtype=np.float32) for f in feats],
            })

    return slim.mapInPandas(kernel, FEATURE_SCHEMA)


def repartition_for_payloads(df: DataFrame, avg_payload_bytes: int,
                             target_partition_bytes: int = 256 << 20,
                             n_rows: int | None = None) -> DataFrame:
    """Size partitions by payload volume so Arrow batches fit in memory:
    rows_per_partition ≈ target_bytes / avg_payload.

    Pass ``n_rows`` when known (manifest record counts, parquet footers —
    metadata, no scan): without it the count() action executes the frame's
    FULL upstream lineage (possibly decode kernels over the binary column)
    once, and the repartition then runs it all again."""
    if n_rows is None:
        n_rows = df.count()
    rows_per_part = max(1, target_partition_bytes // max(avg_payload_bytes, 1))
    n_parts = max(1, (n_rows + rows_per_part - 1) // rows_per_part)
    return df.repartition(int(n_parts))
