"""Scale features: bucketed co-located joins, fused quantiles, AQE confs."""

import pyspark.sql.functions as F
import pytest

from schemasaurus_spark import datagen
from schemasaurus_spark.operators import aggregates as agg


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketing co-locates join keys at WRITE time, so repeated joins on
    the bucket key skip the exchange entirely — the strategy for recurring
    dimension joins at 100 TB (SURVEY §2.4 joins row)."""
    import shutil

    df = datagen.finalize(datagen.gen_sequences(spark, 500, 4))
    spark.sql("DROP TABLE IF EXISTS seq_bucketed")
    spark.sql("DROP TABLE IF EXISTS src_stats_bucketed")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directories persist — clear them
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/seq_bucketed", ignore_errors=True)
    shutil.rmtree(f"{wh}/src_stats_bucketed", ignore_errors=True)
    (df.write.bucketBy(8, "source").sortBy("source")
       .mode("overwrite").saveAsTable("seq_bucketed"))
    (df.groupBy("source").agg(F.avg("n_tok").alias("avg_tok"))
       .write.bucketBy(8, "source").sortBy("source")
       .mode("overwrite").saveAsTable("src_stats_bucketed"))

    a = spark.table("seq_bucketed")
    b = spark.table("src_stats_bucketed")
    joined = a.join(b.hint("merge"), "source")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 500


def test_column_stats_fused_quantiles(spark):
    df = datagen.finalize(datagen.gen_sequences(spark, 2000, 8))
    stats = agg.column_stats(df, ["n_tok"], by="source",
                             quantile_columns=["n_tok"])
    rows = {r["group_key"]: r for r in stats.collect()}
    q = rows["web"]["p50_p95_p99"]
    assert q is not None and len(q) == 3
    assert 1 <= q[0] <= q[1] <= q[2] <= 2048
    # one scan: single Exchange in the plan
    p = stats._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") <= 2  # agg exchange (+ AQE read)
