"""Custom stateful streaming operator: cross-batch duplicate detection.

``stream_duplicate_keys`` is the STREAMING form of the uniqueness check
(operators/aggregates.uniqueness_check): state = per-key occurrence count,
kept in Spark's state store via ``applyInPandasWithState`` (Arrow-batched —
the task-brief pattern for custom stateful operators). Each micro-batch
emits one violation row per duplicate occurrence beyond the first, matching
the batch check's semantics (one row per extra occurrence, value = the key).

State is partitioned by key (groupBy shuffle), so state size scales out
with executors — but at 10^12 distinct keys it still grows without bound,
so ``ttl_minutes`` arms a ProcessingTimeTimeout per key: a key idle longer
than the TTL has its state evicted (duplicates further apart than the TTL
go undetected — the documented trade; the exact batch check over the full
table remains the ground truth).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, occurrence long, constraint_id string, message string"
)
STATE_SCHEMA = "count long"


def _make_dedup_fn(ttl_ms: int | None):
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # idle key: evict, bounded state
            return
        (k,) = key
        seen = state.get[0] if state.exists else 0
        new = sum(len(pdf) for pdf in pdfs)
        total = seen + new
        state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        # first-ever occurrence is legitimate; everything after violates
        start = max(seen + 1, 2)
        occurrences = list(range(start, total + 1))
        if occurrences:
            yield pd.DataFrame({
                "key": [k] * len(occurrences),
                "occurrence": occurrences,
                "constraint_id": ["unique.doc_id"] * len(occurrences),
                "message": ["shall be unique across the table"]
                           * len(occurrences),
            })
    return fn


def stream_duplicate_keys(stream_df: DataFrame, key_col: str = "doc_id",
                          ttl_minutes: float | None = None) -> DataFrame:
    """Per-key duplicate-occurrence stream (append mode). ``ttl_minutes``
    bounds state: keys idle past the TTL are evicted (see module doc).

    NULL keys are excluded, matching the batch check's SQL UNIQUE
    semantics (aggregates.uniqueness_check: NULL != NULL — grouping nulls
    together would report false duplicates the ground-truth batch pass
    never reports). ``ttl_minutes`` must be positive when given: a falsy
    0 silently meant "no timeout at all" — unbounded state, the exact
    failure the TTL exists to prevent (round-4 review)."""
    if ttl_minutes is not None and ttl_minutes <= 0:
        raise ValueError(
            f"ttl_minutes must be positive (got {ttl_minutes}); pass None "
            f"to disable eviction explicitly")
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)
    return (
        stream_df.select(stream_df[key_col].cast("string").alias("key"))
        .where("key IS NOT NULL")
        .groupBy("key")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
