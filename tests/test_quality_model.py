"""Hashed linear quality scoring (text.hashed_linear_score): parity with
an INDEPENDENT Python implementation of the same model (portable md5
bucketing), plus gate/plan behavior."""

import hashlib
import math
import random
import re

import pyspark.sql.functions as F

from schemasaurus_spark.operators.text import (
    hashed_linear_score, quality_filter,
)

SEED = 11
D = 64
random.seed(3)
WEIGHTS = [random.uniform(-1, 1) for _ in range(D)]
BIAS = -0.1

DOCS = [
    ("a", "The quick brown fox jumps over the lazy dog"),
    ("b", "spam spam spam buy now buy now"),
    ("c", ""),
    ("d", "   padded   whitespace   tokens "),
    ("e", "word"),
]


def py_bucket(tok: str) -> int:
    h = hashlib.md5(f"{SEED}|{tok}".encode()).hexdigest()
    return int(h[:15], 16) % D


def py_score(text: str, bigrams: bool) -> float:
    ws = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    feats = list(ws)
    if bigrams:
        feats += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    raw = BIAS + sum(WEIGHTS[py_bucket(t)] for t in feats)
    return 1.0 / (1.0 + math.exp(-raw))


def _scores(spark, bigrams):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = hashed_linear_score(df, WEIGHTS, BIAS, seed=SEED,
                              bigrams=bigrams)
    return {r["doc_id"]: r["quality_score"] for r in out.collect()}


def test_score_matches_independent_python_unigram(spark):
    got = _scores(spark, bigrams=False)
    for doc_id, text in DOCS:
        assert abs(got[doc_id] - py_score(text, False)) < 1e-9, doc_id


def test_score_matches_independent_python_bigram(spark):
    got = _scores(spark, bigrams=True)
    for doc_id, text in DOCS:
        assert abs(got[doc_id] - py_score(text, True)) < 1e-9, doc_id
    # bigrams actually change multi-word scores
    uni = _scores(spark, bigrams=False)
    assert got["a"] != uni["a"]
    # empty/one-word docs have no bigrams: same score either way
    assert got["c"] == uni["c"] and got["e"] == uni["e"]


def test_empty_doc_scores_sigmoid_of_bias(spark):
    got = _scores(spark, bigrams=False)
    assert abs(got["c"] - 1.0 / (1.0 + math.exp(-BIAS))) < 1e-12


def test_quality_filter_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    thr = sorted(py_score(t, False) for _, t in DOCS)[2]  # median
    kept = quality_filter(df, WEIGHTS, BIAS, threshold=thr, seed=SEED)
    expect = {d for d, t in DOCS if py_score(t, False) >= thr}
    assert {r["doc_id"] for r in kept.collect()} == expect
    assert "__q" not in kept.columns


def test_score_plan_shape(spark):
    """Buckets JVM-side; ONE Arrow-vectorized gather (the sanctioned
    pandas_udf path — measured ~10x over per-token element_at into the
    wide weight array; F.udf remains banned engine-wide). Scoring itself
    adds NO shuffle: on an input already at cluster width, the only
    Exchange in the plan is the input's own repartition (the operator's
    scale-adaptive spread is a no-op there — round-6 narrow-scan fix)."""
    wide = (spark.sparkContext.defaultParallelism * 2)
    df = (spark.createDataFrame(DOCS, "doc_id string, text string")
          .repartition(wide))
    plan = (hashed_linear_score(df, WEIGHTS, BIAS, seed=SEED)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1            # only the input's own
    assert "BatchEvalPython" not in plan          # no row-at-a-time Python
    assert plan.count("ArrowEvalPython") == 1     # exactly one Arrow stage


def test_score_spreads_narrow_scans(spark):
    """A narrow input (fewer partitions than cluster width) is widened
    before the CPU-dense per-token hashing — and the spread never changes
    scores (round-6: sf1.0 documents arrive as a 2-row-group file that
    otherwise serializes the whole projection onto 2 cores)."""
    df = spark.createDataFrame(DOCS, "doc_id string, text string").coalesce(1)
    out = hashed_linear_score(df, WEIGHTS, BIAS, seed=SEED)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    narrow = {r["doc_id"]: r["quality_score"] for r in out.collect()}
    wide = {r["doc_id"]: r["quality_score"]
            for r in hashed_linear_score(
                df.repartition(8), WEIGHTS, BIAS, seed=SEED).collect()}
    assert narrow == wide


def test_rejects_empty_weights(spark):
    import pytest as _pytest

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with _pytest.raises(ValueError):
        hashed_linear_score(df, [])
