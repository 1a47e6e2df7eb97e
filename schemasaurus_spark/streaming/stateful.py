"""Custom stateful streaming operator: cross-batch duplicate detection.

``stream_duplicate_keys`` is the STREAMING form of the uniqueness check
(operators/aggregates.uniqueness_check): state = per-key occurrence count,
kept in Spark's state store via ``applyInPandasWithState`` (Arrow-batched —
the task-brief pattern for custom stateful operators). Each micro-batch
emits one violation row per duplicate occurrence beyond the first, matching
the batch check's semantics (one row per extra occurrence, value = the key).

State is partitioned by key (groupBy shuffle), so state size scales out
with executors; a production deployment bounds it with a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) or key TTL.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, occurrence long, constraint_id string, message string"
)
STATE_SCHEMA = "count long"


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    seen = state.get[0] if state.exists else 0
    new = sum(len(pdf) for pdf in pdfs)
    total = seen + new
    state.update((total,))
    # first-ever occurrence is legitimate; everything after is a violation
    start = max(seen + 1, 2)
    occurrences = list(range(start, total + 1))
    if occurrences:
        yield pd.DataFrame({
            "key": [k] * len(occurrences),
            "occurrence": occurrences,
            "constraint_id": ["unique.doc_id"] * len(occurrences),
            "message": ["shall be unique across the table"] * len(occurrences),
        })


def stream_duplicate_keys(stream_df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Per-key duplicate-occurrence stream (append mode)."""
    return (
        stream_df.select(stream_df[key_col].cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
