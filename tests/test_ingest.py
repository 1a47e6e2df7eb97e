"""Permissive JSONL/CSV ingest → normalize → validate (sources breadth)."""

from schemasaurus_spark import dsl
from schemasaurus_spark.normalizer import NormalizerSpec, col_spec
from schemasaurus_spark.sources.ingest import ingest, read_csv, read_jsonl

COLUMNS = ["doc_id", "n_tok", "flag", "lang"]
SPEC = NormalizerSpec([
    col_spec("doc_id", "integer"),
    col_spec("n_tok", "integer"),
    col_spec("flag", "boolean"),
    col_spec("lang", "string", default="unknown"),
])
SUITE = dsl.Suite(columns={
    "doc_id": [dsl.NotNull()],
    "n_tok": [dsl.Minimum(1)],
    "lang": [dsl.Enum(["en", "es", "unknown"])],
})


def test_jsonl_ingest_validates(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": "1", "n_tok": "5", "flag": "on", "lang": "en"}\n'
        '{"doc_id": "2", "n_tok": "0", "flag": "off"}\n'       # n_tok<1, lang default
        '{"doc_id": "3", "n_tok": "junk", "flag": "1", "lang": "zz"}\n')
    res = ingest(spark, str(p), "jsonl", COLUMNS, SPEC, SUITE)
    rows = res.violations().collect()
    got = sorted((r["doc_id"], r["constraint_id"]) for r in rows)
    # 'junk' -> parseInt null -> minimum null-skips; zz fails enum
    assert got == [(2, "minimum"), (3, "enum")]
    assert res.validated.where("lang = 'unknown'").count() == 1


def test_csv_ingest_validates(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("doc_id,n_tok,flag,lang\n"
                 "1,5,true,en\n"
                 "2,-3,false,es\n")
    res = ingest(spark, str(p), "csv", COLUMNS, SPEC, SUITE)
    rows = res.violations().collect()
    assert [(r["doc_id"], r["constraint_id"]) for r in rows] == [(2, "minimum")]


def test_readers_stage_all_strings(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"doc_id": "1", "n_tok": "5", "flag": "on", "lang": "en"}\n')
    assert all(t == "string" for _, t in read_jsonl(spark, str(p), COLUMNS).dtypes)
    c = tmp_path / "x.csv"
    c.write_text("doc_id,n_tok,flag,lang\n1,2,on,en\n")
    assert all(t == "string" for _, t in read_csv(spark, str(c), COLUMNS).dtypes)


def test_orc_ingest_validates(spark, tmp_path):
    p = str(tmp_path / "in_orc")
    spark.createDataFrame(
        [("1", "5", "on", "en"), ("2", "-3", "off", "es")],
        "doc_id string, n_tok string, flag string, lang string"
    ).write.orc(p)
    res = ingest(spark, p, "orc", COLUMNS, SPEC, SUITE)
    rows = res.violations().collect()
    assert [(r["doc_id"], r["constraint_id"]) for r in rows] == [(2, "minimum")]


def test_append_retry_after_crash_between_write_and_manifest(spark, tmp_path):
    """A crash after the parquet write but before the manifest save leaves
    an orphan dir for an UNRECORDED snapshot id; the retry recomputes the
    same id and must overwrite the staging dir, not brick the store
    (review fix: mode('error') raised 'path already exists' forever)."""
    from schemasaurus_spark.sources.storage import SnapshotStore

    store = SnapshotStore(str(tmp_path / "tbl"))
    df = spark.range(10).selectExpr("id AS doc_id")
    store.append(df)
    # simulate the crashed attempt: orphan data dir for the NEXT id,
    # manifest never updated
    orphan = tmp_path / "tbl" / "data" / "s00001"
    df.limit(3).write.parquet(str(orphan))
    snap = store.append(df)                    # retry must succeed
    assert snap.id == "s00001"
    assert store.read(spark, "s00001").count() == 20   # 10 + 10, not 3


def test_parquet_ingest_applies_declared_columns(spark, tmp_path):
    """Typed-format ingest must project to the declared columns and fail
    loudly on a misspelled one (round-4 review: `columns` was silently
    ignored for parquet/orc)."""
    import pytest
    from schemasaurus_spark import NotNull, Suite
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec
    from schemasaurus_spark.sources.ingest import ingest

    path = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a", "x")], "id long, v string, extra string") \
        .write.parquet(path)
    spec = NormalizerSpec(columns=[col_spec("id", "integer"),
                                   col_spec("v")])
    suite = Suite(id_column="id", columns={"v": [NotNull()]},
                  allow_undeclared_columns=False)
    res = ingest(spark, path, "parquet", ["id", "v"], spec, suite)
    assert res.is_valid()  # 'extra' projected away, not a violation

    with pytest.raises(ValueError, match="declared column"):
        ingest(spark, path, "parquet", ["id", "nope"], spec, suite)
