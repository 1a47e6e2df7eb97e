"""Operator packages + shared scale helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, factor: int = 2) -> DataFrame:
    """Widen a NARROW scan to cluster width before CPU-heavy per-row work.

    Small inputs (or few large row groups) yield fewer scan splits than
    cores, serializing expression-heavy projections (hashing, shingling,
    regex) on a handful of tasks. One tiny round-robin shuffle of the raw
    rows buys full-width parallelism. Scale-adaptive, not local-tuned: at
    production scale the scan's natural split count exceeds
    ``defaultParallelism * factor`` and this is a no-op — the same
    condition minhash_signature has always used.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
