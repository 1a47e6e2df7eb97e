"""Sequence-packing operators (operators/packing.py): exact stream
arithmetic vs a pure-Python reference, full-sequence/no-split guarantees,
determinism, dirty-weight policy, and the distributed-prefix-sum plan
shape (no global window)."""

import pyspark.sql.functions as F

from schemasaurus_spark import datagen
from schemasaurus_spark.operators.packing import pack_concat, pack_greedy

CAP = 512


def _docs(spark, n=400):
    df = datagen.finalize(datagen.gen_sequences(spark, n, 8))
    # weights in [1, 300] so several docs share each sequence
    return df.withColumn("n_tok", F.pmod("n_tok", F.lit(300)) + 1)


def test_pack_concat_matches_python_reference(spark):
    """The exact (doc, seq, offsets) span set equals a pure-Python replay
    of the documented stream order: buckets ascending, docs by
    (xxhash64(id, seed), id) within a bucket, chopped every CAP tokens."""
    df = _docs(spark, n=200)
    n_buckets = 8
    rows = df.select(
        "doc_id", "n_tok",
        F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(n_buckets))
         .cast("int").alias("b"),
        F.xxhash64("doc_id", F.lit(7)).alias("h")).collect()
    stream = sorted(rows, key=lambda r: (r["b"], r["h"], r["doc_id"]))
    expect, pos = set(), 0
    for r in stream:
        start, end = pos, pos + r["n_tok"]
        pos = end
        for seq in range(start // CAP, (end - 1) // CAP + 1):
            lo = seq * CAP
            s, e = max(start, lo), min(end, lo + CAP)
            expect.add((r["doc_id"], seq, s - lo, s - start, e - s))
    got = {(r["doc_id"], r["seq_id"], r["seq_begin"], r["doc_begin"],
            r["span_len"])
           for r in pack_concat(df, CAP, n_buckets=n_buckets).collect()}
    assert got == expect


def test_pack_concat_sequences_full_and_docs_reassemble(spark):
    df = _docs(spark)
    out = pack_concat(df, CAP).cache()
    total = df.agg(F.sum("n_tok")).first()[0]
    per_seq = {r["seq_id"]: r["tok"] for r in
               out.groupBy("seq_id").agg(F.sum("span_len").alias("tok"))
                  .collect()}
    last = max(per_seq)
    # every sequence but the last is exactly full; nothing is lost
    assert all(tok == CAP for s, tok in per_seq.items() if s != last)
    assert sum(per_seq.values()) == total
    assert set(per_seq) == set(range(last + 1))  # no gaps in seq ids
    # per-doc spans reassemble the document: contiguous from offset 0
    bad = (out.groupBy("doc_id")
              .agg(F.min("doc_begin").alias("lo"),
                   F.max(F.col("doc_begin") + F.col("span_len")).alias("hi"),
                   F.sum("span_len").alias("tok"))
              .where((F.col("lo") != 0) | (F.col("hi") != F.col("tok"))))
    assert bad.count() == 0
    out.unpersist()


def test_pack_concat_deterministic_and_seed_sensitive(spark):
    df = _docs(spark, n=150)
    a = sorted(map(tuple, pack_concat(df, CAP).collect()))
    b = sorted(map(tuple, pack_concat(df, CAP).collect()))
    c = sorted(map(tuple, pack_concat(df, CAP, seed=99).collect()))
    assert a == b
    assert a != c  # different stream order -> different spans


def test_pack_concat_no_global_window(spark):
    """The 100 TB shape: ONE hash-partition shuffle (the per-bucket
    window); the global offset never serializes into a partitionBy-less
    window (which plans as a SinglePartition exchange)."""
    out = pack_concat(_docs(spark, n=100), CAP)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange hashpartitioning") == 1
    assert "singlepartition" not in plan.lower()


def test_pack_concat_excludes_dirty_weights(spark):
    df = spark.createDataFrame(
        [("a", 100), ("b", None), ("c", 0), ("d", -5), ("e", 50)],
        "doc_id string, n_tok int")
    out = pack_concat(df, CAP)
    assert {r["doc_id"] for r in out.collect()} == {"a", "e"}
    assert out.agg(F.sum("span_len")).first()[0] == 150


def test_pack_greedy_no_split_and_capped(spark):
    df = _docs(spark)
    out = pack_greedy(df, CAP).cache()
    # whole docs: exactly one row per clean input doc
    assert out.count() == df.count()
    fills = (out.where(~F.col("over_budget"))
                .groupBy("bucket", "bin")
                .agg(F.sum("n_tok").alias("tok")))
    assert fills.where(F.col("tok") > CAP).count() == 0
    # first-fit property: at most one open (non-oversize) bin per bucket
    # is <= half full — two half-empty bins would have been merged
    lax = (fills.where(F.col("tok") <= CAP // 2)
                .groupBy("bucket").count()
                .where(F.col("count") > 1))
    assert lax.count() == 0
    out.unpersist()


def test_pack_greedy_oversize_flagged_singletons(spark):
    df = spark.createDataFrame(
        [("big", 9000), ("a", 200), ("b", 300)],
        "doc_id string, n_tok int")
    out = pack_greedy(df, CAP, n_buckets=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["big"]["over_budget"] is True
    assert not rows["a"]["over_budget"] and not rows["b"]["over_budget"]
    # the oversize doc shares its bin with nobody
    big_bin = (rows["big"]["bucket"], rows["big"]["bin"])
    mates = [d for d, r in rows.items()
             if (r["bucket"], r["bin"]) == big_bin]
    assert mates == ["big"]


def test_pack_greedy_deterministic(spark):
    df = _docs(spark, n=300)
    a = sorted(map(tuple, pack_greedy(df, CAP).collect()))
    b = sorted(map(tuple, pack_greedy(df, CAP).collect()))
    assert a == b
