"""Constraint suggestion (profiler.suggest_suite): Deequ-style draft-suite
generation. Pins (a) the suggested constraints on the sequences table,
(b) that the suggested suite validates its own table CLEAN and catches
corrupted rows, (c) the 2-scan budget (one fused profile pass + one
bounded enum-confirmation pass), and (d) edge cases: empty table,
all-null column, high-cardinality string (no Enum), HLL never
short-circuits the EXACT enum cardinality check."""

import pyspark.sql.functions as F

from schemasaurus_spark import datagen, dsl, validate
from schemasaurus_spark.profiler import suggest_suite


def _types(cs):
    return [type(c).__name__ for c in cs]


def test_suggest_on_sequences_table(spark, tmp_path):
    path = str(tmp_path / "seq")
    datagen.finalize(datagen.gen_sequences(spark, 600, 4)).write.parquet(path)
    df = spark.read.parquet(path)
    res = suggest_suite(df)

    assert res.n_rows == 600
    assert res.suite.id_column == "doc_id"
    # doc_id: unique string with no nulls -> NotNull + length bounds,
    # NO Enum (cardinality 600 >> 32), and a uniqueness candidate
    assert "Enum" not in _types(res.suite.columns["doc_id"])
    assert "NotNull" in _types(res.suite.columns["doc_id"])
    assert "doc_id" in res.unique_candidates
    # source: 4 values -> Enum with the exact sorted domain
    enum = [c for c in res.suite.columns["source"]
            if isinstance(c, dsl.Enum)]
    assert enum and sorted(enum[0].values) == sorted(datagen.SOURCES)
    # n_tok: numeric bounds
    assert {"Minimum", "Maximum"} <= set(_types(res.suite.columns["n_tok"]))
    # tokens: size bounds + element bounds
    t = _types(res.suite.columns["tokens"])
    assert {"MinItems", "MaxItems", "Items"} <= set(t)

    # the suggested suite holds on the data it was profiled from
    assert validate(df, res.suite).is_valid()

    # ...and catches corruption of the profiled domain
    bad = df.withColumn(
        "source", F.when(F.col("n_tok") % 7 == 0, F.lit("sp4m"))
                   .otherwise(F.col("source")))
    v = validate(bad, res.suite).violations()
    assert v.where(F.col("constraint_id") == "enum").count() > 0


def test_suggest_is_two_scans(spark, tmp_path, monkeypatch):
    from pyspark.sql.classic.dataframe import DataFrame

    path = str(tmp_path / "seq2")
    datagen.finalize(datagen.gen_sequences(spark, 300, 2)).write.parquet(path)
    df = spark.read.parquet(path)

    def _n_file_scans(frame):
        s = frame._jdf.queryExecution().executedPlan().toString().lower()
        s = s.split("== initial plan ==")[0]
        return s.count("filescan") + s.count("batchscan")

    scans = []
    real = DataFrame.collect

    def counting(self):
        out = real(self)
        n = _n_file_scans(self)
        if n:
            scans.append(n)
        return out

    monkeypatch.setattr(DataFrame, "collect", counting)
    suggest_suite(df)
    monkeypatch.undo()
    # pass 1 fused profile + pass 2 enum confirmation, one scan each
    assert scans == [1, 1], scans


def test_suggest_empty_table(spark):
    df = spark.createDataFrame([], "a string, b long")
    res = suggest_suite(df, id_column="a")
    assert res.n_rows == 0
    assert res.suite.columns == {}
    assert res.unique_candidates == []


def test_suggest_all_null_and_high_cardinality(spark):
    rows = [(None, f"v{i}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "dead string, key string, x long")
    res = suggest_suite(df, id_column="key")
    # all-null column: no constraints at all (no vacuous claims)
    assert "dead" not in res.suite.columns
    # 200-distinct string: bounds but no Enum (> enum_max_distinct)
    assert "Enum" not in _types(res.suite.columns["key"])
    # id_column never becomes an Enum even at low cardinality
    res2 = suggest_suite(df.limit(5), id_column="key")
    assert "Enum" not in _types(res2.suite.columns.get("key", []))


def test_enum_exact_check_not_hll(spark):
    """A column whose EXACT cardinality exceeds the threshold gets no Enum
    even when the HLL screen admitted it to pass 2 (threshold just under
    the true count; HLL error could put the estimate either side)."""
    df = spark.createDataFrame([(f"s{i % 40}",) for i in range(400)],
                               "s string")
    res = suggest_suite(df, id_column="s", enum_max_distinct=39)
    assert "Enum" not in _types(res.suite.columns.get("s", []))
    # at threshold 40 the exact check passes -> Enum appears (on a
    # non-id column; use a second column to dodge the id exclusion)
    df2 = df.withColumn("t", F.col("s"))
    res3 = suggest_suite(df2, id_column="s", enum_max_distinct=40)
    got = [c for c in res3.suite.columns["t"] if isinstance(c, dsl.Enum)]
    assert got and len(got[0].values) == 40


def test_suggested_suite_roundtrips_through_json_schema(spark, tmp_path):
    """The draft suite is a first-class citizen of the schema surface:
    suggest -> suite_to_json_schema -> suite_from_json_schema revalidates
    the profiled table clean (the human-review loop stores drafts as
    draft-4 documents)."""
    from schemasaurus_spark import suite_from_json_schema, suite_to_json_schema

    path = str(tmp_path / "seq3")
    datagen.finalize(datagen.gen_sequences(spark, 300, 2)).write.parquet(path)
    df = spark.read.parquet(path)
    res = suggest_suite(df)
    doc = suite_to_json_schema(res.suite)
    back = suite_from_json_schema(doc, id_column=res.suite.id_column)
    assert validate(df, back).is_valid()
    # corruption still caught after the round-trip
    bad = df.withColumn("source", F.lit("sp4m"))
    assert not validate(bad, back).is_valid()


def test_suggested_stat_bounds_enforce_loop(spark):
    """suggest_suite emits AggregateChecks-ready stat_bounds: they pass
    the profiled table, and a mean shift beyond the slack fires."""
    import pyspark.sql.functions as F

    from schemasaurus_spark.engine import AggregateChecks, run_full_validation
    from schemasaurus_spark.profiler import suggest_suite

    df = datagen.finalize(datagen.gen_sequences(spark, 400, 4))
    res = suggest_suite(df, columns=["n_tok", "doc_id"])
    sb = res.stat_bounds
    assert set(sb) == {"n_tok"}                      # numeric columns only
    assert res.evidence["n_tok"]["mean"] is not None
    assert sb["n_tok"]["min_value"] == res.evidence["n_tok"]["min"]

    # suggested bounds pass their own table (the Deequ draft contract).
    # The profile is GLOBAL, so enforcement must be too: null_rate_by=None
    # (per-group means differ from the global mean beyond any slack)
    clean = run_full_validation(
        df, res.suite,
        AggregateChecks(stat_bounds=sb, null_rate_by=None))
    assert clean.is_valid()

    # a mean shift beyond slack*span fires stats.mean_bound
    shifted = df.withColumn(
        "n_tok", F.least(F.col("n_tok") * 2, F.lit(2048)).cast("int"))
    dirty = run_full_validation(
        shifted, res.suite, AggregateChecks(null_rate_by=None, stat_bounds={
            "n_tok": {k: v for k, v in sb["n_tok"].items()
                      if k.endswith("mean")}}))
    codes = {r["constraint_id"] for r in dirty.violations().collect()}
    assert "stats.mean_bound" in codes

    # constant column: span 0 falls back to |mean| — non-degenerate bounds
    one = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    sres = suggest_suite(one, id_column="x")
    b = sres.stat_bounds["x"]
    assert b["min_mean"] < 5.0 < b["max_mean"]


def test_stat_bounds_skip_nan_columns(spark):
    """A NaN-bearing column gets NO suggested stat bounds (NaN bounds
    compare False forever — a vacuous check)."""
    df = spark.createDataFrame(
        [(float("nan"), 1.0), (2.0, 3.0)], "bad double, good double")
    res = suggest_suite(df, id_column="good")
    assert "bad" not in res.stat_bounds
    assert "good" in res.stat_bounds
