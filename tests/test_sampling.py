"""Sampling / data-mixture operators (operators/sampling.py): exactness,
determinism (hash-ordered, resumable), budget semantics, and the salted
skew path's bounded error."""

import pyspark.sql.functions as F

from schemasaurus_spark import datagen
from schemasaurus_spark.operators.sampling import (
    reservoir_per_key, sample_by_fraction, stratified_sample_exact,
    token_budget_mixture)


def _docs(spark, n=600):
    return datagen.finalize(datagen.gen_sequences(spark, n, 8))


def test_sample_by_fraction_is_zero_shuffle(spark):
    df = _docs(spark)
    out = sample_by_fraction(df, "source", {"web": 0.5, "books": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "exchange" not in plan  # Bernoulli: streams through the scan
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got <= {"web", "books"}  # unlisted groups drop to fraction 0


def test_stratified_exact_counts_and_determinism(spark):
    df = _docs(spark)
    totals = {r["source"]: r["count"]
              for r in df.groupBy("source").count().collect()}
    fr = {"web": 0.25, "books": 0.5}
    out = stratified_sample_exact(df, "source", fr)
    got = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    import math
    assert got == {s: math.ceil(totals[s] * f) for s, f in fr.items()}
    # deterministic: same seed -> same rows
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  stratified_sample_exact(df, "source", fr)
                  .select("doc_id").collect())
    assert ids1 == ids2
    # different seed -> (almost surely) different rows
    ids3 = sorted(r["doc_id"] for r in
                  stratified_sample_exact(df, "source", fr, seed=99)
                  .select("doc_id").collect())
    assert ids1 != ids3


def test_reservoir_per_key_exactly_k(spark):
    df = _docs(spark)
    out = reservoir_per_key(df, "source", k=7)
    sizes = {r["source"]: r["count"]
             for r in out.groupBy("source").count().collect()}
    totals = {r["source"]: r["count"]
              for r in df.groupBy("source").count().collect()}
    assert sizes == {s: min(7, n) for s, n in totals.items()}


def test_token_budget_mixture_caps_each_group(spark):
    # weights capped at 100 so the greedy bound (budget - max_weight)
    # BINDS for every group (the raw fixture's 1800-token docs made the
    # books bound negative/vacuous — round-5 review)
    df = _docs(spark).withColumn("n_tok", F.pmod("n_tok", F.lit(100)) + 1)
    budgets = {"web": 3000.0, "books": 1500.0}
    out = token_budget_mixture(df, "source", budgets)
    spent = {r["source"]: r["tok"] for r in
             out.groupBy("source").agg(F.sum("n_tok").alias("tok")).collect()}
    assert set(spent) <= set(budgets)
    max_tok = 100
    for s, tok in spent.items():
        assert tok <= budgets[s]
        # greedy: adding the NEXT hash-ordered row would overflow
        assert tok > budgets[s] - max_tok


def test_token_budget_mixture_salted_bounded_error(spark):
    """salt=N splits each group into N capped sub-partitions: total spend
    stays <= budget and within N*max_weight below it. Weights are CAPPED
    at 50 against a 4000-budget so the lower bound (4000 - 4*50 = 3800)
    actually BINDS — the natural fixture's max n_tok made it negative and
    the assertion vacuous (round-5 review)."""
    df = _docs(spark, n=2000).withColumn(
        "n_tok", F.pmod("n_tok", F.lit(50)) + 1)
    budgets = {"web": 4000.0}
    n_salt = 4
    out = token_budget_mixture(df, "source", budgets, salt=n_salt)
    spent = out.agg(F.sum("n_tok")).first()[0]
    max_tok = 50
    assert spent <= budgets["web"]
    assert spent > budgets["web"] - n_salt * max_tok  # binding: > 3800
    # deterministic under the same seed/salt
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  token_budget_mixture(df, "source", budgets, salt=n_salt)
                  .select("doc_id").collect())
    assert ids1 == ids2


def test_mixture_single_window_plan_shape(spark):
    """Unsalted mixture = ONE shuffle (the window partition), nothing
    driver-side."""
    df = _docs(spark)
    out = token_budget_mixture(df, "source", {"web": 1000.0})
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert plan.count("exchange") <= 1


def test_stratified_exact_no_float_overshoot(spark):
    """100 rows at fraction 0.07 → exactly 7, not 8 (100*0.07 rounds to
    7.000000000000001 in doubles; round-before-ceil)."""
    rows = [(f"a-{i:08d}", "web") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = stratified_sample_exact(df, "source", {"web": 0.07})
    assert out.count() == 7


def test_stratified_exact_prefilters_unlisted_groups(spark):
    df = _docs(spark)
    out = stratified_sample_exact(df, "source", {"books": 0.5})
    assert {r["source"] for r in out.select("source").distinct().collect()} \
        == {"books"}


def test_token_budget_mixture_excludes_dirty_weights(spark):
    """NULL and negative weights must not ride the budget (review
    finding: NULL rows were free, negatives made selection non-prefix)."""
    rows = [(f"d-{i:04d}", "web", 100) for i in range(20)]
    rows += [("d-null", "web", None), ("d-neg", "web", -500)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = token_budget_mixture(df, "source", {"web": 500.0})
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert "d-null" not in got and "d-neg" not in got
    assert len(got) == 5  # 5 * 100 == the whole budget


def test_token_budget_mixture_salt_zero_falls_back(spark):
    """salt=0 previously NULLed every partition id and divided the budget
    by zero (uncapped output); it now falls back to the unsalted path."""
    df = _docs(spark)
    a = token_budget_mixture(df, "source", {"web": 2000.0}, salt=0)
    b = token_budget_mixture(df, "source", {"web": 2000.0})
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in b.select("doc_id").collect())


def test_token_budget_mixture_excludes_nan_and_inf(spark):
    """NaN passes `>= 0` (Spark orders NaN above all numbers) and poisons
    the running sum for every hash-later row; +Inf likewise — both must be
    excluded up front (round-5 review, live-repro'd: a NaN row silently
    dropped 6 in-budget rows)."""
    rows = [(f"d-{i:04d}", "web", 100.0) for i in range(20)]
    rows += [("d-nan", "web", float("nan")), ("d-inf", "web", float("inf"))]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok double")
    out = token_budget_mixture(df, "source", {"web": 2000.0})
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert "d-nan" not in got and "d-inf" not in got
    assert len(got) == 20  # every clean row fits the budget


# ---------------------------------------- splits + deterministic shuffle


def test_assign_splits_total_stable_and_proportional(spark):
    from schemasaurus_spark.operators.sampling import assign_splits

    df = datagen.finalize(datagen.gen_sequences(spark, 2000, 8))
    out = assign_splits(df, {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000          # total assignment
    assert set(counts) == {"train", "valid", "test"}
    assert 1400 < counts["train"] < 1900         # ~1600 ± hash noise
    # stability: re-derivation AND subset invariance (new data never
    # migrates existing docs — the anti-leakage property)
    again = {r["doc_id"]: r["split"]
             for r in assign_splits(df, {"train": 0.8, "valid": 0.1,
                                         "test": 0.1})
             .select("doc_id", "split").collect()}
    sub = assign_splits(df.limit(500), {"train": 0.8, "valid": 0.1,
                                        "test": 0.1})
    for r in sub.select("doc_id", "split").collect():
        assert again[r["doc_id"]] == r["split"]


def test_assign_splits_matches_duckdb(spark):
    """Portable membership: DuckDB recomputes the EXACT same assignment
    from the md5 derivation (the external-auditor property)."""
    import duckdb

    from schemasaurus_spark.operators.sampling import assign_splits

    df = datagen.finalize(datagen.gen_sequences(spark, 300, 2))
    got = {r["doc_id"]: r["split"] for r in
           assign_splits(df, {"train": 0.9, "test": 0.1}, seed=11)
           .select("doc_id", "split").collect()}
    ids = [r["doc_id"] for r in df.select("doc_id").collect()]
    con = duckdb.connect()
    rows = con.execute("""
        SELECT id, CASE WHEN
            CAST(('0x' || substring(md5('11|' || id), 1, 15)) AS UBIGINT)
            / 1152921504606846976.0 < 0.9
        THEN 'train' ELSE 'test' END
        FROM (SELECT unnest(?) AS id)
    """, [ids]).fetchall()
    assert len(rows) == 300
    for doc_id, split in rows:
        assert got[doc_id] == split, doc_id


def test_assign_splits_rejects_bad_weights(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.sampling import assign_splits

    df = datagen.finalize(datagen.gen_sequences(spark, 10, 1))
    for bad in ({}, {"a": 0}, {"a": -1}, {"a": float("nan")},
                {"a": float("inf")}):
        with _pytest.raises(ValueError):
            assign_splits(df, bad)


def test_assign_splits_is_projection_only(spark):
    from schemasaurus_spark.operators.sampling import assign_splits

    df = datagen.finalize(datagen.gen_sequences(spark, 100, 2))
    plan = (assign_splits(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


def test_shard_and_shuffle_permutation(spark):
    from schemasaurus_spark.operators.sampling import shard_and_shuffle

    df = datagen.finalize(datagen.gen_sequences(spark, 500, 4))
    out = shard_and_shuffle(df, n_shards=8)
    rows = out.select("doc_id", "shard", "shuffle_key").collect()
    assert len(rows) == 500                       # every row exactly once
    assert len({r["doc_id"] for r in rows}) == 500
    assert {r["shard"] for r in rows} == set(range(8))
    # deterministic: same (shard, key) per doc on a re-run
    again = {r["doc_id"]: (r["shard"], r["shuffle_key"])
             for r in shard_and_shuffle(df, n_shards=8)
             .select("doc_id", "shard", "shuffle_key").collect()}
    for r in rows:
        assert again[r["doc_id"]] == (r["shard"], r["shuffle_key"])
    # the read order is a real permutation, not ingest order: within one
    # partition rows come back sorted by (shard, key)
    part = out.where(F.col("shard") == 3)
    keys = [r["shuffle_key"] for r in part.collect()]
    assert keys == sorted(keys)


def test_sample_rows_deterministic_and_subset_stable(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.sampling import sample_rows

    df = datagen.finalize(datagen.gen_sequences(spark, 2000, 8))
    s = sample_rows(df, 0.1)
    ids = {r["doc_id"] for r in s.select("doc_id").collect()}
    assert 120 < len(ids) < 280                  # ~200 ± hash noise
    # determinism + subset invariance (growing input keeps membership)
    again = {r["doc_id"]
             for r in sample_rows(df, 0.1).select("doc_id").collect()}
    assert again == ids
    half = {r["doc_id"] for r in
            sample_rows(df.limit(1000), 0.1).select("doc_id").collect()}
    assert half <= ids
    # nested fractions: a 5% sample is a subset of the 10% sample
    small = {r["doc_id"] for r in
             sample_rows(df, 0.05).select("doc_id").collect()}
    assert small <= ids
    # zero-shuffle plan
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError):
            sample_rows(df, bad)


def test_sample_rows_null_ids_always_sampled(spark):
    """NULL-id rows are ALWAYS in the smoke sample: a NULL hash predicate
    would silently drop them and the pre-flight would pass on a table
    whose id column is broken."""
    from schemasaurus_spark.operators.sampling import sample_rows

    df = spark.createDataFrame(
        [(None, "a")] * 10 + [(f"d{i}", "b") for i in range(1000)],
        "doc_id string, source string")
    s = sample_rows(df, 0.01)
    got = s.groupBy(F.col("doc_id").isNull().alias("n")).count().collect()
    by_null = {r["n"]: r["count"] for r in got}
    assert by_null.get(True, 0) == 10            # every null-id row kept
    assert by_null.get(False, 0) < 100           # ~1% of the rest
