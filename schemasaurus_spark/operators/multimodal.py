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


def real_decode(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "inject a decoder via extract_features(decoder=...)"
    )


def extract_features(media_df: DataFrame, decoder=None,
                     batch_hint_bytes: int = 64 << 20) -> DataFrame:
    """Arrow-batched feature extraction over (id, payload).

    The mapInPandas kernel sees pandas batches; per-element decode happens
    in numpy/PIL-land (vectorizable), never via Spark row UDFs."""
    decoder = decoder or _stub_decode
    slim = media_df.select("id", "payload")  # column pruning: no metadata/tail

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [decoder(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "sha1": payloads.map(lambda p: hashlib.sha1(bytes(p)).hexdigest()),
                "feat": [np.asarray(f, dtype=np.float32) for f in feats],
            })

    return slim.mapInPandas(kernel, FEATURE_SCHEMA)


def repartition_for_payloads(df: DataFrame, avg_payload_bytes: int,
                             target_partition_bytes: int = 256 << 20) -> DataFrame:
    """Size partitions by payload volume so Arrow batches fit in memory:
    rows_per_partition ≈ target_bytes / avg_payload."""
    n_rows = df.count()
    rows_per_part = max(1, target_partition_bytes // max(avg_payload_bytes, 1))
    n_parts = max(1, (n_rows + rows_per_part - 1) // rows_per_part)
    return df.repartition(int(n_parts))
