"""Driver-contract query registry: name → (spark_fn, oracle_sql).

Each entry exercises one engine operator family (SURVEY.md §2) over the
driver-provided tables and carries an ANSI-SQL oracle with IDENTICAL output
column names and value semantics, runnable by DuckDB on the same parquet.
The driver compares row-count + schema + order-insensitive value-hash at
sf=0.01 (CORRECTNESS gate); tests/test_oracle_parity.py mirrors that gate
locally.

Numeric-parity rules used throughout:
* doubles that pass through different summation orders are rounded (6 dp)
  or computed via DECIMAL sums (exact) before comparison;
* portable hashing is md5-based (identical in Spark and DuckDB);
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from schemasaurus_spark import dsl
from schemasaurus_spark.validate import validate
from schemasaurus_spark.compiler import VIOLATIONS_COL
from schemasaurus_spark.operators import aggregates as agg
from schemasaurus_spark.operators import dedup, similarity, text

# --------------------------------------------------------------------- util


def _t(spark: SparkSession, sf_dir: str, name: str,
       wide: bool = False) -> DataFrame:
    """Read a driver table. ``wide=True`` widens narrow scans to cluster
    width before CPU-dense per-row work (guide §2.5 input-parallelism fix:
    the sandbox tables arrive as 1-2 parquet row groups, serializing
    expression-heavy projections onto 1-2 cores; at production scale the
    split count exceeds cluster width and this is a no-op)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if wide:
        from schemasaurus_spark.operators import spread_scan
        df = spread_scan(df)
    return df


DOC_LANGS = ["en", "es", "de", "fr"]  # zh deliberately excluded → violations
NCHARS_MIN, NCHARS_MAX = 50, 520
HIST_EDGES = [0.0, 100.0, 200.0, 300.0, 400.0, 500.0, 600.0]


def documents_suite() -> dsl.Suite:
    """Flagship validation suite over the `documents` table — one constraint
    per reference operator family (enum/minimum/maximum/minLength/conform;
    v4validator.js:181-190, 294-302, 194-203, 305-322)."""
    return dsl.Suite(
        id_column="doc_id",
        columns={
            "doc_id": [dsl.NotNull()],
            "lang": [dsl.NotNull(), dsl.Enum(DOC_LANGS)],
            "n_chars": [dsl.Minimum(NCHARS_MIN), dsl.Maximum(NCHARS_MAX)],
            "text": [dsl.MinLength(NCHARS_MIN)],
            "source": [dsl.Pattern(r"^src[0-9]+$")],
        },
        row=[
            # eqNullSafe ≡ NOT (a IS DISTINCT FROM b): both-NULL passes,
            # matching the DuckDB oracle exactly even if testdata gains nulls
            # (ADVICE r1 'low' — plain == yields NULL → violation on NULL).
            ("n_chars", dsl.Conform(
                name="len_eq",
                expr=lambda c: F.col("n_chars").eqNullSafe(F.length("text")),
            )),
        ],
        name="documents_v1",
    )


# ---------------------------------------------------------------- queries


def q_validate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = validate(_t(spark, sf_dir, "documents"), documents_suite())
    return res.violations().select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "constraint_id", "column", "value",
    )


SQL_VALIDATE_DOCUMENTS = f"""
SELECT doc_id, 'enum' AS constraint_id, 'lang' AS column, lang AS value
  FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','es','de','fr')
UNION ALL
SELECT doc_id, 'required', 'lang', NULL FROM documents WHERE lang IS NULL
UNION ALL
SELECT doc_id, 'required', 'doc_id', NULL FROM documents WHERE doc_id IS NULL
UNION ALL
SELECT doc_id, 'minimum', 'n_chars', CAST(n_chars AS VARCHAR)
  FROM documents WHERE n_chars IS NOT NULL AND n_chars < {NCHARS_MIN}
UNION ALL
SELECT doc_id, 'maximum', 'n_chars', CAST(n_chars AS VARCHAR)
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > {NCHARS_MAX}
UNION ALL
SELECT doc_id, 'minLength', 'text', text
  FROM documents WHERE text IS NOT NULL AND length(text) < {NCHARS_MIN}
UNION ALL
SELECT doc_id, 'pattern', 'source', source
  FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')
UNION ALL
SELECT doc_id, 'custom.len_eq', 'n_chars', CAST(n_chars AS VARCHAR)
  FROM documents WHERE n_chars IS DISTINCT FROM length(text)
"""


def q_verdict_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = validate(_t(spark, sf_dir, "documents"), documents_suite())
    return (
        res.validated
        .groupBy(F.col("source").alias("group_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
        )
        .withColumn("pass", F.col("n_violations") == 0)
    )


SQL_VERDICT_BY_SOURCE = f"""
WITH per_row AS (
  SELECT source,
         (CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
       + (CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
       + (CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','es','de','fr') THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars IS NOT NULL AND n_chars < {NCHARS_MIN} THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars IS NOT NULL AND n_chars > {NCHARS_MAX} THEN 1 ELSE 0 END)
       + (CASE WHEN text IS NOT NULL AND length(text) < {NCHARS_MIN} THEN 1 ELSE 0 END)
       + (CASE WHEN source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END)
       + (CASE WHEN n_chars IS DISTINCT FROM length(text) THEN 1 ELSE 0 END) AS v
  FROM documents)
SELECT source AS group_key, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS n_violations,
       SUM(v) = 0 AS pass
FROM per_row GROUP BY source
"""


def q_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = agg.column_stats(_t(spark, sf_dir, "documents"), ["n_chars"], by="lang")
    return stats.select(
        "group_key",
        "n_rows",
        "n_nulls",
        F.round("null_rate", 6).alias("null_rate"),
        F.col("min").cast("long").alias("min_val"),
        F.col("max").cast("long").alias("max_val"),
    )


SQL_STATS_DOCUMENTS = """
SELECT lang AS group_key, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       ROUND(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS null_rate,
       MIN(n_chars) AS min_val, MAX(n_chars) AS max_val
FROM documents GROUP BY lang
"""


def q_stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quantiles (F.percentile — the exact aggregate, not
    percentile_approx) so DuckDB's quantile_cont matches bit-for-bit after
    rounding; the approximate sketch path stays in stats_documents/tdigest."""
    d = _t(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    return (
        d.groupBy(F.col("lang").alias("group_key"))
        .agg(
            F.round(F.percentile(x, F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(x, F.lit(0.95)), 4).alias("p95"),
            F.round(F.percentile(x, F.lit(0.99)), 4).alias("p99"),
        )
    )


SQL_STATS_QUANTILES = """
SELECT lang AS group_key,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4) AS p95,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 4) AS p99
FROM documents GROUP BY lang
"""


def q_unique_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = agg.uniqueness_check(_t(spark, sf_dir, "events"), key="user_id")
    return res.violations.select(
        F.col("doc_id").cast("long").alias("key_id"), "constraint_id", "arg",
    )


SQL_UNIQUE_USER_EVENTS = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id HAVING COUNT(*) > 1)
SELECT user_id AS key_id, 'unique.doc_id' AS constraint_id,
       CAST(UNNEST(generate_series(2, n)) AS VARCHAR) AS arg
FROM c
"""


def q_ref_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_dim = spark.createDataFrame([(x,) for x in DOC_LANGS], "lang string")
    v = agg.referential_check(
        _t(spark, sf_dir, "documents"), spark_dim, column="lang", id_column="doc_id"
    )
    return v.select(F.col("doc_id").cast("long").alias("doc_id"),
                    "constraint_id", "value")


SQL_REF_LANG = """
SELECT doc_id, 'ref.lang' AS constraint_id, lang AS value
FROM documents WHERE lang NOT IN ('en','es','de','fr')
"""


def q_hist_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.histogram(_t(spark, sf_dir, "documents"), "n_chars",
                         HIST_EDGES, by="lang").select(
        "group_key", "bucket", "count")


SQL_HIST_NCHARS = """
SELECT lang AS group_key,
       CASE WHEN n_chars < 0 THEN -1
            WHEN n_chars < 100 THEN 0 WHEN n_chars < 200 THEN 1
            WHEN n_chars < 300 THEN 2 WHEN n_chars < 400 THEN 3
            WHEN n_chars < 500 THEN 4 WHEN n_chars < 600 THEN 5
            ELSE 6 END AS bucket,
       COUNT(*) AS count
FROM documents WHERE n_chars IS NOT NULL
GROUP BY 1, 2
"""


def q_oneof_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OneOf combinator (v4validator.js:154-170): branches overlap on
    [100, 400] → those rows fail with code `oneOf` (matched >1)."""
    suite = dsl.Suite(
        id_column="doc_id",
        columns={"n_chars": [dsl.OneOf([[dsl.Minimum(100)], [dsl.Maximum(400)]])]},
    )
    res = validate(_t(spark, sf_dir, "documents"), suite)
    return res.violations().select(
        F.col("doc_id").cast("long").alias("doc_id"), "constraint_id", "value")


SQL_ONEOF_NCHARS = """
SELECT doc_id, 'oneOf' AS constraint_id, CAST(n_chars AS VARCHAR) AS value
FROM documents
WHERE n_chars IS NOT NULL AND n_chars >= 100 AND n_chars <= 400
"""


def q_dependency_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency (v4validator.js:104-123): when lang='zh', source must be in
    src0..src4 → 'dependency' + sub-error rows for the rest."""
    allowed = [f"src{i}" for i in range(5)]
    suite = dsl.Suite(
        id_column="doc_id",
        columns={},
        row=[("lang", dsl.Dependency(
            on="lang_zh", constraints=[("source", dsl.Enum(allowed))]))],
    )
    df = _t(spark, sf_dir, "documents").withColumn(
        "lang_zh", F.when(F.col("lang") == "zh", F.lit("zh")))
    res = validate(df, suite)
    return res.violations().select(
        F.col("doc_id").cast("long").alias("doc_id"), "constraint_id", "column")


SQL_DEPENDENCY_LANG_SOURCE = """
WITH bad AS (
  SELECT doc_id FROM documents
  WHERE lang = 'zh' AND source NOT IN ('src0','src1','src2','src3','src4'))
SELECT doc_id, 'dependency' AS constraint_id, 'lang' AS column FROM bad
UNION ALL
SELECT doc_id, 'enum' AS constraint_id, 'source' AS column FROM bad
"""


# ------------------------------------------------------- text / dedup / ann


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish pretokenizer counts in ONE projection (merged
    from the former token_count_bpe entry — frees a slot under the driver's
    ~50-graded-entry cap while keeping both operators value-graded)."""
    d = _t(spark, sf_dir, "documents", wide=True)
    return d.select(
        "doc_id",
        text.token_count_expr(F.col("text")).alias("n_tokens"),
        text.token_count_bpe_expr("text").alias("n_bpe_tokens"),
    )


# the BPE-ish regex starts with a literal apostrophe — doubled ('') inside
# the SQL string literal
SQL_TOKEN_COUNT = (
    r"SELECT doc_id, len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')) AS n_tokens, "
    r"len(regexp_extract_all(text, "
    r"'''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) "
    r"AS n_bpe_tokens FROM documents"
)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(_t(spark, sf_dir, "documents", wide=True))


SQL_TEXT_QUALITY = r"""
WITH w AS (SELECT doc_id, text, list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws FROM documents)
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(ws) AS n_words,
       ROUND(length(regexp_replace(text, '\s', '', 'g')) / CAST(len(ws) AS DOUBLE), 6) AS avg_word_len,
       ROUND(len(list_filter(ws, x -> x IN ('the','a','of'))) / CAST(len(ws) AS DOUBLE), 6) AS filler_ratio
FROM w
"""


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.top_tokens(_t(spark, sf_dir, "documents"), k=20)


SQL_TOP_TOKENS = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '')) AS word
      FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.unigram_logprob(_t(spark, sf_dir, "documents"))


SQL_UNIGRAM_LOGPROB = r"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '')) AS word
  FROM documents),
f AS (SELECT word, COUNT(*) AS n FROM t GROUP BY word),
tot AS (SELECT COUNT(*) AS total FROM t)
SELECT doc_id, ROUND(AVG(ln(n / CAST(total AS DOUBLE))), 6) AS logprob
FROM t JOIN f USING (word), tot
GROUP BY doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_t(spark, sf_dir, "documents"))


SQL_LANG_ID = r"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '') AS ws FROM documents),
h AS (SELECT doc_id,
       len(list_filter(ws, x -> x IN ('the','and','of','a'))) AS en_hits,
       len(list_filter(ws, x -> x IN ('el','la','de','los'))) AS es_hits,
       len(list_filter(ws, x -> x IN ('der','die','das','und'))) AS de_hits,
       len(list_filter(ws, x -> x IN ('le','les','des','et'))) AS fr_hits
FROM w)
SELECT doc_id,
       CASE WHEN fr_hits > GREATEST(en_hits, es_hits, de_hits) THEN 'fr'
            WHEN de_hits > GREATEST(en_hits, es_hits) THEN 'de'
            WHEN es_hits > en_hits THEN 'es'
            ELSE 'en' END AS pred_lang,
       en_hits, es_hits, de_hits, fr_hits
FROM h
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_t(spark, sf_dir, "documents"))


SQL_FINGERPRINT = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
FROM documents
"""


def q_pii_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.pii_signals(_t(spark, sf_dir, "documents"))


SQL_PII_SIGNALS = r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text,
           '\+?[0-9][0-9()\-\s]{7,}[0-9]')) AS n_phones
FROM documents
"""


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ a formatting-mangled copy of every 10th doc (UPPERCASE +
    trailing punctuation, doc_id offset by 10^6): normalization maps each
    copy onto its original's fingerprint, so the exact-dedup queries grade a
    NON-vacuous duplicate set (round-2 VERDICT: the raw fixture has no exact
    dups, so dedup_exact matched on 0 rows — a gate that would stay green if
    the groupBy were wrong)."""
    d = _t(spark, sf_dir, "documents")
    dup = (d.where(F.col("doc_id") % 10 == 0)
           .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                   F.concat(F.upper("text"), F.lit(" !!!")).alias("text")))
    return d.select("doc_id", "text").unionByName(dup)


SQL_DOCS_WITH_DUPS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, upper(text) || ' !!!' AS text
  FROM documents WHERE doc_id % 10 = 0
"""


# q_dedup_exact's staged fingerprint frame from the PREVIOUS invocation —
# unpersisted on the next call so repeated runs (bench attempts, the
# correctness harness) never accumulate cached blocks. Never holds
# results across runs: every entry is a lazy plan recomputed from
# parquet when its own invocation executes.
_DEDUP_EXACT_HANDLES: list[DataFrame] = []


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup GROUPS × APPLY survivors in one graded result (round-5
    fold of the former dedup_exact + dedup_apply entries, freeing a
    registry slot for `decontaminate` under the driver's 50-row gate): for
    every duplicate group, n_surv counts that group's ids surviving
    dedup.dedup_apply — grading the groupBy view AND the survivor
    semi-join together (a correct APPLY keeps exactly the keeper, so
    n_surv must be 1 everywhere; an APPLY that kept extras or dropped the
    keeper shifts the count). dedup_apply's full survivor set stays
    pinned row-for-row by tests/test_text_dedup.py."""
    from schemasaurus_spark.operators import spread_scan

    # ONE query-level spread: every pass below shares the identical
    # repartition subtree (ReusedExchange), and the operators' own
    # scale-adaptive spreads see a wide input and no-op — two separate
    # op-level shuffles of the union measured slower (round 6)
    d = spread_scan(_docs_with_dups(spark, sf_dir))
    # Stage the fingerprint ONCE as a persisted (doc_id, fp) frame — the
    # lightweight proxy of guide §8: the three consumers below (groups,
    # the survivor semi-join, the per-group survivor count) are sibling
    # branches, and siblings are never CSE'd (round-6), so without the
    # persist each branch re-scans the text table and re-evaluates the
    # normalize+md5 (the old shape: 5 scans, 4 fp evaluations, plus a
    # corpus-sized doc_id re-join to attach fp to survivors — survivors
    # now simply KEEP their fp). The persisted frame is ~1% of the input
    # (two small columns), is recomputed from parquet on every
    # invocation (nothing crosses runs), and the previous invocation's
    # handle is released below.
    # Null screen on the INPUT column (fp is NULL iff text is NULL):
    # `isnotnull(text)` pushes into the parquet scan natively, where a
    # null filter on the computed fp would inline the whole md5+regexp
    # expression into the scan as an interpreted DataFilter (the round-2
    # pathology — observed when this was first written as
    # fp.isNotNull()). The coalesce never fires (text is non-null here);
    # it exists to mark fp non-nullable so dedup_apply's null-fp
    # passthrough branch constant-folds away instead of re-scanning the
    # table under an interpreted isnull(md5(...)) filter.
    # Release the previous invocation's cache entry BEFORE registering the
    # new one: CacheManager entries are keyed by canonicalized plan, so a
    # persist of the (identical) new plan followed by unpersist of the old
    # handle would remove the entry just registered — leaving every other
    # invocation uncached (observed via getPersistentRDDs in round-6
    # verification). Unpersist-first also guarantees no attempt can reuse
    # a prior attempt's materialized blocks: each invocation recomputes
    # from parquet.
    while _DEDUP_EXACT_HANDLES:
        try:
            _DEDUP_EXACT_HANDLES.pop().unpersist()
        except Exception:
            pass
    fpf = (d.where(F.col("text").isNotNull())
           .select(F.col("doc_id"),
                   F.coalesce(text.content_fingerprint(F.col("text")),
                              F.lit("")).alias("fp"))
           .persist())
    _DEDUP_EXACT_HANDLES.append(fpf)
    groups = dedup.exact_duplicates(fpf, fp_col="fp")
    surv = dedup.dedup_apply(fpf, fp_col="fp")
    n_surv = surv.groupBy("fp").agg(F.count(F.lit(1)).alias("n_surv"))
    return (groups.join(n_surv, "fp", "left")
            .select("fp", "n_docs", "keep_id",
                    F.coalesce("n_surv", F.lit(0)).cast("bigint")
                    .alias("n_surv")))


SQL_DEDUP_EXACT = f"""
WITH d AS ({SQL_DOCS_WITH_DUPS}),
fps AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM d WHERE text IS NOT NULL),
groups AS (
  SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
  FROM fps GROUP BY 1 HAVING COUNT(*) > 1),
surv AS (
  SELECT doc_id FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (
             PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             ORDER BY doc_id) AS rn
    FROM d) WHERE rn = 1 OR text IS NULL),
sc AS (
  SELECT f.fp, COUNT(*) AS n_surv
  FROM fps f JOIN surv s USING (doc_id) GROUP BY 1)
SELECT g.fp, g.n_docs, g.keep_id, COALESCE(sc.n_surv, 0) AS n_surv
FROM groups g LEFT JOIN sc USING (fp)
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the LLM-pipeline 8-gram-overlap scrub):
    benchmark = every 10th ORIGINAL doc; training corpus = everything else
    in the staged _docs_with_dups union. Each mangled copy (UPPERCASE +
    ' !!!', id+10^6) shares its original's lower-cased 8-grams, so the
    gate grades a guaranteed-non-vacuous contaminated set with exact
    per-doc hit counts (grams touching the appended '!!!' token don't
    match — the count itself is discriminating, not just membership)."""
    d = _docs_with_dups(spark, sf_dir)
    bench = (_t(spark, sf_dir, "documents")
             .where(F.col("doc_id") % 10 == 0))
    train = d.where((F.col("doc_id") % 10 != 0)
                    | (F.col("doc_id") >= 1_000_000))
    return dedup.decontaminate(train, bench)


SQL_DECONTAMINATE = f"""
WITH d AS ({SQL_DOCS_WITH_DUPS}),
bw AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(
             generate_series(1, GREATEST(len(ws) - 7, 1)),
             i -> substr(md5(array_to_string(ws[i:i+7], ' ')), 1, 16))) AS g
    FROM bw)),
tw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS ws
  FROM d
  WHERE (doc_id % 10 <> 0 OR doc_id >= 1000000) AND text IS NOT NULL),
tg AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, GREATEST(len(ws) - 7, 1)),
             i -> substr(md5(array_to_string(ws[i:i+7], ' ')), 1, 16))) AS g
    FROM tw))
SELECT tg.doc_id, COUNT(*) AS n_hits
FROM tg JOIN bg USING (g) GROUP BY 1
"""


def q_dedup_prefix_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.prefix_buckets(_t(spark, sf_dir, "documents"))


SQL_DEDUP_PREFIX_BUCKETS = r"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws FROM documents)
SELECT md5(array_to_string(ws[1:4], ' ')) AS bucket, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM w GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_buckets(_t(spark, sf_dir, "documents"))


SQL_MINHASH_LSH = r"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws FROM documents),
sh AS (SELECT doc_id,
       list_transform(generate_series(1, GREATEST(len(ws) - 4, 1)),
                      i -> array_to_string(ws[i:i+4], ' ')) AS shingles
FROM w),
sig AS (SELECT doc_id,
  list_min(list_transform(shingles, s -> substr(md5('s0|' || s), 1, 8))) AS mh0,
  list_min(list_transform(shingles, s -> substr(md5('s0|' || s), 9, 8))) AS mh1,
  list_min(list_transform(shingles, s -> substr(md5('s0|' || s), 17, 8))) AS mh2,
  list_min(list_transform(shingles, s -> substr(md5('s0|' || s), 25, 8))) AS mh3,
  list_min(list_transform(shingles, s -> substr(md5('s1|' || s), 1, 8))) AS mh4,
  list_min(list_transform(shingles, s -> substr(md5('s1|' || s), 9, 8))) AS mh5,
  list_min(list_transform(shingles, s -> substr(md5('s1|' || s), 17, 8))) AS mh6,
  list_min(list_transform(shingles, s -> substr(md5('s1|' || s), 25, 8))) AS mh7
FROM sh),
bands AS (
  SELECT doc_id, 0 AS band_idx, mh0 || mh1 AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig
  UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig
  UNION ALL SELECT doc_id, 3, mh6 || mh7 FROM sig)
SELECT band_idx, band_key, COUNT(*) AS n_docs, MIN(doc_id) AS min_id
FROM bands GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"))


SQL_JACCARD_PAIRS = r"""
WITH w AS (SELECT doc_id AS id,
                  md5(array_to_string(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')[1:4], ' ')) AS bucket,
                  list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')) AS ws
           FROM documents)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(len(list_intersect(a.ws, b.ws)) /
             CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE), 6) AS jaccard
FROM w a JOIN w b ON a.bucket = b.bucket AND a.id < b.id
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components (min-label
    propagation) over the verified candidate pairs — 'keep one per
    cluster'. Oracle = recursive-CTE transitive closure."""
    pairs = dedup.jaccard_pairs(_t(spark, sf_dir, "documents"))
    return dedup.duplicate_clusters(pairs)


SQL_DEDUP_CLUSTERS = r"""
WITH RECURSIVE w AS (
  SELECT doc_id AS id,
         md5(array_to_string(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')[1:4], ' ')) AS bucket
  FROM documents),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM w a JOIN w b ON a.bucket = b.bucket AND a.id < b.id),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, dst) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
SELECT src AS id, LEAST(src, MIN(dst)) AS cluster
FROM reach GROUP BY src
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.cosine_topk(emb, qvec, k=10)


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT vec_id,
             ROUND(
               list_sum(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / ( sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * sqrt(list_sum(list_transform((SELECT qv FROM q), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               5) AS score
      FROM embeddings)
SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10
"""


def q_ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schemasaurus_spark.operators.similarity import ann_knn_join

    # dims pinned: the oracle reproduces the axis-aligned bucketing; the
    # library default is adaptive Gaussian planes (similarity.auto_n_bits)
    return ann_knn_join(_t(spark, sf_dir, "embeddings"), k=3,
                        dims=list(range(8)))


SQL_ANN_KNN_JOIN = """
WITH b AS (SELECT vec_id AS id, embedding AS v,
  concat(
    CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings),
p AS (
  SELECT a.id AS id, b.id AS neighbor,
         ROUND(
           list_sum(list_transform(list_zip(a.v, b.v),
                                    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / ( sqrt(list_sum(list_transform(a.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           5) AS score
  FROM b a JOIN b b ON a.bucket = b.bucket AND a.id != b.id)
SELECT id, neighbor, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY score DESC, neighbor) AS rn
  FROM p) WHERE rn <= 3
"""


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_signals(_t(spark, sf_dir, "documents"))


SQL_REPETITION_SIGNALS = r"""
WITH w AS (SELECT doc_id, text,
                  list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws
           FROM documents),
g AS (SELECT doc_id, text,
             list_transform(generate_series(1, GREATEST(len(ws) - 2, 1)),
                            i -> array_to_string(ws[i:i+2], ' ')) AS grams
      FROM w)
SELECT doc_id,
       ROUND(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6)
         AS dup_ngram_frac,
       ROUND(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
             / CAST(length(text) AS DOUBLE), 6) AS symbol_ratio
FROM g
"""


def q_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.sign_lsh_buckets(_t(spark, sf_dir, "embeddings"),
                                       dims=list(range(8)))


SQL_SIGN_LSH = """
SELECT concat(
         CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket,
       COUNT(*) AS n_vecs, MIN(vec_id) AS min_id
FROM embeddings GROUP BY 1
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan-heavy aggregation — the throughput headline.
    DECIMAL sums keep the summation exact; the FINAL column is emitted as
    ROUND(CAST(... AS DOUBLE), 2) on both engines because the driver's
    value-hash canonicalizes DECIMAL differently across engines
    (VERDICT.md round 1, 'What's wrong #1')."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- window / date / json


def q_violation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage (SURVEY §2.4): rank constraint_ids by
    violation count within each column (violation triage view)."""
    from pyspark.sql.window import Window

    res = validate(_t(spark, sf_dir, "documents"), documents_suite())
    counts = (
        res.violations()
        .groupBy("column", "constraint_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(F.desc("n"), "constraint_id")
    return counts.withColumn("rnk", F.row_number().over(w))


SQL_VIOLATION_RANK = f"""
WITH v AS ({SQL_VALIDATE_DOCUMENTS}),
c AS (SELECT "column", constraint_id, COUNT(*) AS n FROM v GROUP BY 1, 2)
SELECT "column", constraint_id, n,
       ROW_NUMBER() OVER (PARTITION BY "column" ORDER BY n DESC, constraint_id) AS rnk
FROM c
"""


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions + decimal-exact aggregates over the events stream."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias("sum_value"),
        )
    )


SQL_EVENTS_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions: extract props.k, aggregate per event_type."""
    ev = _t(spark, sf_dir, "events", wide=True)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schemasaurus_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), bits=8)


SQL_SIMHASH = r"""
WITH w AS (SELECT doc_id,
                  list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), w -> w <> '')) AS ws
           FROM documents)
SELECT doc_id,
  CAST((
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 1) != 0)) > len(ws) THEN 1 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 2) != 0)) > len(ws) THEN 2 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 4) != 0)) > len(ws) THEN 4 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 8) != 0)) > len(ws) THEN 8 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 16) != 0)) > len(ws) THEN 16 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 32) != 0)) > len(ws) THEN 32 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 64) != 0)) > len(ws) THEN 64 ELSE 0 END) +
    (CASE WHEN 2*len(list_filter(ws, x -> (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) & 128) != 0)) > len(ws) THEN 128 ELSE 0 END)
  ) AS BIGINT) AS simhash
FROM w
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schemasaurus_spark.operators.similarity import cosine_neardup_pairs

    # dims pinned to the oracle-reproducible axis projection (library
    # default = adaptive Gaussian planes)
    return cosine_neardup_pairs(_t(spark, sf_dir, "embeddings"),
                                threshold=0.2, dims=list(range(8)))


SQL_EMBEDDING_NEARDUP = """
WITH b AS (SELECT vec_id AS id, embedding AS v,
  concat(
    CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
    CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(
         list_sum(list_transform(list_zip(a.v, b.v),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / ( sqrt(list_sum(list_transform(a.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         5) AS score
FROM b a JOIN b b ON a.bucket = b.bucket AND a.id < b.id
WHERE ROUND(
         list_sum(list_transform(list_zip(a.v, b.v),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / ( sqrt(list_sum(list_transform(a.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         5) >= 0.2
"""



def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.winnow_fingerprints(_t(spark, sf_dir, "documents"))


SQL_WINNOW_FINGERPRINTS = r"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, GREATEST(length(text) - 7, 1)),
                        i -> substr(md5(substr(text, i, 8)), 1, 8)) AS hs
  FROM documents),
m AS (
  SELECT doc_id,
         list_distinct(
           list_transform(generate_series(1, GREATEST(len(hs) - 3, 1)),
                          j -> list_min(hs[j:j+3]))) AS fps
  FROM g)
SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS fp_min,
       list_max(fps) AS fp_max
FROM m
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation via F.window (batch form of the
    streaming windowed verdicts) — epoch-aligned 6h buckets."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


SQL_EVENTS_TUMBLING = """
SELECT time_bucket(INTERVAL 6 HOURS, ts) AS w_start, event_type,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift PSI, fully in DataFrame ops: each lang's n_chars
    histogram vs the 'en' baseline over HIST_EDGES; eps-smoothed
    proportions, PSI = sum((q-p)*ln(q/p)) rounded to 4 dp (bucket math is
    exact ints; only the final ln/sum touches floats)."""
    h = agg.histogram(_t(spark, sf_dir, "documents"), "n_chars",
                      HIST_EDGES, by="lang")
    totals = h.groupBy("group_key").agg(F.sum("count").alias("tot"))
    probs = (
        h.join(totals, "group_key")
        .select("group_key", "bucket",
                (F.col("count") / F.col("tot")).alias("p"))
    )
    base = probs.where(F.col("group_key") == "en").select(
        F.col("bucket"), F.col("p").alias("p_base"))
    eps = 1e-6
    joined = (
        probs.join(base, "bucket", "outer")
        .where(F.col("group_key").isNotNull())
        .select(
            "group_key",
            F.coalesce("p", F.lit(0.0)).alias("q"),
            F.coalesce("p_base", F.lit(0.0)).alias("p0"),
        )
        .select(
            "group_key",
            F.greatest(F.col("q"), F.lit(eps)).alias("q"),
            F.greatest(F.col("p0"), F.lit(eps)).alias("p0"),
        )
    )
    return (
        joined.groupBy("group_key")
        .agg(F.round(F.sum((F.col("q") - F.col("p0"))
                           * F.log(F.col("q") / F.col("p0"))), 4).alias("psi"))
    )


SQL_DRIFT_PSI = """
WITH h AS (
  SELECT lang AS group_key,
         CASE WHEN n_chars < 0 THEN -1
              WHEN n_chars < 100 THEN 0 WHEN n_chars < 200 THEN 1
              WHEN n_chars < 300 THEN 2 WHEN n_chars < 400 THEN 3
              WHEN n_chars < 500 THEN 4 WHEN n_chars < 600 THEN 5
              ELSE 6 END AS bucket,
         COUNT(*) AS count
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
t AS (SELECT group_key, SUM(count) AS tot FROM h GROUP BY 1),
probs AS (
  SELECT h.group_key, h.bucket, h.count / CAST(t.tot AS DOUBLE) AS p
  FROM h JOIN t USING (group_key)),
base AS (SELECT bucket, p AS p_base FROM probs WHERE group_key = 'en'),
j AS (
  SELECT probs.group_key,
         GREATEST(COALESCE(probs.p, 0.0), 1e-6) AS q,
         GREATEST(COALESCE(base.p_base, 0.0), 1e-6) AS p0
  FROM probs FULL OUTER JOIN base USING (bucket)
  WHERE probs.group_key IS NOT NULL)
SELECT group_key, ROUND(SUM((q - p0) * ln(q / p0)), 4) AS psi
FROM j GROUP BY group_key
"""


def q_rollup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage (SURVEY §2.4): ROLLUP(lang, source) doc counts
    with subtotals — used for multi-granularity verdict dashboards."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.sum(F.col("n_chars").cast("decimal(18,2)")).cast("double"), 2).alias("sum_chars"))
    )


SQL_ROLLUP_DOCS = """
SELECT lang, source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_chars
FROM documents GROUP BY ROLLUP (lang, source)
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via window lag + cumulative gap counting (30-minute
    inactivity boundary) — per user session counts."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))  # TIMESTAMP_NTZ: no direct long cast in ANSI
    gap = ep - F.lag(ep).over(w)
    flagged = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE_EVENTS = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


def q_normalize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalizer coverage (normalizer.js parity): stage documents as
    all-strings (plus an undeclared column), normalize back to typed —
    defaults, parseInt, boolean truth table, pruning in one projection."""
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize

    staged = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("n_chars").cast("string").alias("n_chars"),
        # NULL n_chars stages flag as NULL (not 'off') so the normalized
        # boolean matches the oracle's `n_chars % 2 = 0` NULL semantics.
        F.when(F.col("n_chars").isNotNull(),
               F.when(F.col("n_chars") % 2 == 0, F.lit("on"))
                .otherwise(F.lit("off"))).alias("flag"),
        F.when(F.col("lang") == "zh", F.lit(None)).otherwise(F.col("lang")).alias("lang"),
        # nested-struct default materialization (normalizer_spec.js:46-57):
        # meta.b missing/NULL → default; emitted as a scalar field because
        # struct rendering differs across engines
        F.struct(F.when(F.col("doc_id") % 3 != 0, F.col("source")).alias("b")).alias("meta"),
        # round-5: element-wise cast INSIDE an existing array
        # (normalizer.js element descent) and map VALUE casts + dict
        # default — emitted as scalars (array/map rendering differs
        # across engines)
        F.array(F.col("n_chars").cast("string"), F.lit("x7"),
                F.col("doc_id").cast("string")).alias("tags"),
        F.when(F.col("doc_id") % 10 != 0,
               F.map_from_arrays(
                   F.array(F.lit("a"), F.lit("b")),
                   F.array(F.col("n_chars").cast("string"),
                           F.lit("12.9kg")))).alias("attrs"),
        F.lit("junk").alias("undeclared"),
    )
    spec = NormalizerSpec([
        col_spec("doc_id", "integer"),
        col_spec("n_chars", "integer"),
        col_spec("flag", "boolean"),
        col_spec("lang", "string", default="unknown"),
        col_spec("meta.b", "string", default="none"),
        col_spec("tags", "array<integer>"),
        col_spec("attrs", "map<integer>", default={"a": "0"}),
    ])
    return normalize(staged, spec).select(
        "doc_id", "n_chars", "flag", "lang",
        F.col("meta.b").alias("meta_b"),
        F.col("tags")[0].alias("tag0"),
        F.col("tags")[1].alias("tag1"),
        F.col("tags")[2].alias("tag2"),
        F.col("attrs")["a"].alias("attr_a"),
        F.col("attrs")["b"].alias("attr_b"))


SQL_NORMALIZE_ROUNDTRIP = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       n_chars % 2 = 0 AS flag,
       CASE WHEN lang IS NULL OR lang = 'zh' THEN 'unknown' ELSE lang END AS lang,
       CASE WHEN doc_id % 3 <> 0 THEN source ELSE 'none' END AS meta_b,
       CAST(n_chars AS BIGINT) AS tag0,
       CAST(NULL AS BIGINT) AS tag1,
       doc_id AS tag2,
       CASE WHEN doc_id % 10 = 0 THEN 0
            ELSE CAST(n_chars AS BIGINT) END AS attr_a,
       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 12 END AS attr_b
FROM documents
"""



def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path (coarse quantizer + probe subset) — graded
    (round-3 VERDICT #5): FIXED centroids (the embeddings of vec_id 1..8)
    make probe selection and cluster assignment deterministic, so the
    DuckDB oracle reproduces the same probed-cluster filter + rounded
    cosine top-k. Assignment still runs through the library's Arrow
    mapInPandas kernel — the oracle grades the REAL path, not a stand-in."""
    from schemasaurus_spark.operators.similarity import ann_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x)
            for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    cents = [[float(x) for x in r["embedding"]]
             for r in emb.where(F.col("vec_id").between(1, 8))
                         .orderBy("vec_id").collect()]
    return ann_ivf_topk(emb, qvec, k=10, n_probe=3, centroids=cents)


# Distance/assignment parity: both engines compute squared-L2 to the same
# 8 fixed centroid vectors in float64 and break ties by centroid order;
# cosine scores round to 5 digits (the engine-portability convention every
# ANN oracle here uses).
SQL_ANN_IVF = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id AS cid, embedding AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
probe AS (
  SELECT cid FROM c, q
  ORDER BY list_sum(list_transform(list_zip(cv, qv),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), cid
  LIMIT 3),
assign AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_sum(list_transform(list_zip(embedding, cv),
                      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
                    cid) AS rn
  FROM embeddings, c),
cand AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e
  JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
  WHERE a.cid IN (SELECT cid FROM probe)),
s AS (SELECT vec_id,
             ROUND(
               list_sum(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / ( sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * sqrt(list_sum(list_transform((SELECT qv FROM q), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               5) AS score
      FROM cand)
SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10
"""


def q_jsonschema_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation driven by a raw draft-4 JSON Schema document — the
    reference's own input format (iterator.js:16-20), translated by
    schema_json.suite_from_json_schema."""
    from schemasaurus_spark.schema_json import suite_from_json_schema

    schema = {
        "type": "object",
        "required": ["doc_id"],
        "properties": {
            "doc_id": {"type": "integer"},
            "lang": {"enum": ["en", "es", "de", "fr"]},
            "n_chars": {"minimum": 60, "maximum": 500,
                        "exclusiveMaximum": True},
            "source": {"pattern": "^src[0-9]+$", "minLength": 4},
        },
    }
    suite = suite_from_json_schema(schema, id_column="doc_id",
                                   name="jsonschema_docs")
    res = validate(_t(spark, sf_dir, "documents"), suite)
    return res.violations().select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "constraint_id", "column")


SQL_JSONSCHEMA_VALIDATE = """
SELECT doc_id, 'enum' AS constraint_id, 'lang' AS column
  FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','es','de','fr')
UNION ALL
SELECT doc_id, 'minimum', 'n_chars'
  FROM documents WHERE n_chars IS NOT NULL AND n_chars < 60
UNION ALL
SELECT doc_id, 'maximum.exclusive', 'n_chars'
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 500
UNION ALL
SELECT doc_id, 'pattern', 'source'
  FROM documents WHERE source IS NOT NULL
         AND NOT regexp_matches(source, '^src[0-9]+$')
UNION ALL
SELECT doc_id, 'minLength', 'source'
  FROM documents WHERE source IS NOT NULL AND length(source) < 4
"""


def q_validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy validation: the full constraint machinery over the largest
    table (lineitem), one projection, ~10% violation rate. Composite row id
    staged as l_orderkey*10 + l_linenumber."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "li_id", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    suite = dsl.Suite(
        id_column="li_id",
        columns={
            "l_quantity": [dsl.NotNull(), dsl.Minimum(1), dsl.Maximum(45)],
            "l_discount": [dsl.Maximum(0.08)],
            "l_returnflag": [dsl.Pattern(r"^[AN]$")],
        },
        name="lineitem_v1",
    )
    return validate(li, suite).violations().select(
        F.col("li_id").cast("long").alias("li_id"), "constraint_id", "column")


SQL_VALIDATE_LINEITEM = """
WITH li AS (SELECT l_orderkey * 10 + l_linenumber AS li_id, *
            FROM lineitem)
SELECT li_id, 'required' AS constraint_id, 'l_quantity' AS column
  FROM li WHERE l_quantity IS NULL
UNION ALL
SELECT li_id, 'minimum', 'l_quantity'
  FROM li WHERE l_quantity IS NOT NULL AND l_quantity < 1
UNION ALL
SELECT li_id, 'maximum', 'l_quantity'
  FROM li WHERE l_quantity IS NOT NULL AND l_quantity > 45
UNION ALL
SELECT li_id, 'maximum', 'l_discount'
  FROM li WHERE l_discount IS NOT NULL AND l_discount > 0.08
UNION ALL
SELECT li_id, 'pattern', 'l_returnflag'
  FROM li WHERE l_returnflag IS NOT NULL
         AND NOT regexp_matches(l_returnflag, '^[AN]$')
"""


def q_salted_events_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (skew path) must equal a plain groupBy:
    sums run on DECIMAL for exactness, final column emitted as
    ROUND(double, 2) on both engines."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,6)"))
    out = agg.salted_agg(ev, "event_type",
                         [("count", "n"), ("sum", "value_dec")],
                         salt_buckets=16)
    return out.select(
        "event_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("sum_value_dec").cast("double"), 2).alias("sum_value"))


SQL_SALTED_EVENTS_STATS = """
SELECT event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY event_type
"""


def q_docs_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-ops coverage (SURVEY §2.4): exceptAll — documents minus the
    English subset, multiplicity-preserving."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    en = d.where(F.col("lang") == "en")
    return d.exceptAll(en)


SQL_DOCS_EXCEPT = """
SELECT doc_id, lang FROM documents
EXCEPT ALL
SELECT doc_id, lang FROM documents WHERE lang = 'en'
"""


# ------------------------------------------- rows-only (no SQL oracle)


def q_validate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array<struct> element validation (round-2 VERDICT 'What's missing
    #3'): Items(fields=...) descends into per-element struct fields — the
    reference's items walk recursing into object sub-schemas
    (processor.js:31-64). Stages a deterministic spans column (start/end/
    label per element) from documents; constraints per field, one violation
    per offending element, code items.<field>.<subcode>."""
    d = _t(spark, sf_dir, "documents", wide=True)
    did = F.col("doc_id")
    mk = F.transform(
        F.sequence(F.lit(1).cast("bigint"), did % 4 + 1),
        lambda i: F.struct(
            ((did * i) % 50 - 5).alias("start"),
            F.when((did + i) % 17 == 0, F.lit(None).cast("bigint"))
             .otherwise((did * i) % 50 - 5 + (did + i) % 30).alias("end"),
            F.when((did + i) % 5 == 0, F.lit("bad"))
             .otherwise(F.lit("ok")).alias("label"),
        ))
    staged = d.select("doc_id", mk.alias("spans"))
    suite = dsl.Suite(
        id_column="doc_id",
        columns={"spans": [dsl.Items(fields={
            "start": [dsl.Minimum(0)],
            "end": [dsl.NotNull(), dsl.Maximum(40)],
            "label": [dsl.Enum(["ok", "good"])],
        })]},
        name="validate_spans",
    )
    return validate(staged, suite).violations().select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "constraint_id", "column", "value")


SQL_VALIDATE_SPANS = """
WITH e AS (
  SELECT doc_id,
         (doc_id * i) % 50 - 5 AS s,
         CASE WHEN (doc_id + i) % 17 = 0 THEN NULL
              ELSE (doc_id * i) % 50 - 5 + (doc_id + i) % 30 END AS e_,
         CASE WHEN (doc_id + i) % 5 = 0 THEN 'bad' ELSE 'ok' END AS label
  FROM documents, UNNEST(generate_series(1, doc_id % 4 + 1)) AS t(i))
SELECT doc_id, 'items.start.minimum' AS constraint_id, 'spans' AS column,
       CAST(s AS VARCHAR) AS value
  FROM e WHERE s < 0
UNION ALL
SELECT doc_id, 'items.end.required', 'spans', CAST(NULL AS VARCHAR)
  FROM e WHERE e_ IS NULL
UNION ALL
SELECT doc_id, 'items.end.maximum', 'spans', CAST(e_ AS VARCHAR)
  FROM e WHERE e_ > 40
UNION ALL
SELECT doc_id, 'items.label.enum', 'spans', label
  FROM e WHERE label = 'bad'
"""


def q_validate_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-depth Items descent (round-3 VERDICT missing #3 / next #4):
    constraints on ARRAY-typed struct fields (`array<struct<…,
    tags: array<string>>>`) and on array-of-array elements — the
    reference's items walk recursion (processor.js:31-64) at depth ≥2.
    One violation per offending OUTER element; value column is omitted
    (array-valued offenders render engine-specifically), so the oracle
    pins (doc_id, constraint_id, column) and the row count pins the
    per-element extraction."""
    d = _t(spark, sf_dir, "documents", wide=True)
    did = F.col("doc_id")
    # spans: struct elements with a scalar field and a nested string array
    mk_tags_full = lambda i: F.transform(
        F.sequence(F.lit(1).cast("bigint"), F.lit(2).cast("bigint")),
        lambda j: F.substring(F.lit("tagx"), 1,
                              ((did + i + j) % 4).cast("int")))
    spans = F.transform(
        F.sequence(F.lit(1).cast("bigint"), did % 3 + 1),
        lambda i: F.struct(
            ((did * i) % 20 - 2).alias("start"),
            F.slice(mk_tags_full(i), 1, ((did + i) % 3).cast("int"))
             .alias("tags"),
        ))
    # mat: array<array<int>> with occasional negative inner elements
    mat = F.transform(
        F.sequence(F.lit(1).cast("bigint"), did % 2 + 1),
        lambda i: F.transform(
            F.sequence(F.lit(1).cast("bigint"), F.lit(2).cast("bigint")),
            lambda j: (did * i * j) % 10 - 1))
    staged = d.select("doc_id", spans.alias("spans"), mat.alias("mat"))
    suite = dsl.Suite(
        id_column="doc_id",
        columns={
            "spans": [dsl.Items(fields={
                "start": [dsl.Minimum(0)],
                "tags": [dsl.MinItems(1), dsl.Items([dsl.MinLength(2)])],
            })],
            "mat": [dsl.Items([dsl.Items([dsl.Minimum(0)])])],
        },
        name="validate_nested",
    )
    return validate(staged, suite).violations().select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "constraint_id", "column")


SQL_VALIDATE_NESTED = """
WITH e AS (
  SELECT doc_id, i,
         (doc_id * i) % 20 - 2 AS start,
         list_slice(list_transform(generate_series(1, 2),
                    j -> substring('tagx', 1, (doc_id + i + j) % 4)),
                    1, (doc_id + i) % 3) AS tags
  FROM documents, UNNEST(generate_series(1, doc_id % 3 + 1)) AS t(i)),
m AS (
  SELECT doc_id, i,
         list_transform(generate_series(1, 2),
                        j -> (doc_id * i * j) % 10 - 1) AS inner_arr
  FROM documents, UNNEST(generate_series(1, doc_id % 2 + 1)) AS t(i))
SELECT doc_id, 'items.start.minimum' AS constraint_id, 'spans' AS column
  FROM e WHERE start < 0
UNION ALL
SELECT doc_id, 'items.tags.minItems', 'spans'
  FROM e WHERE len(tags) < 1
UNION ALL
SELECT doc_id, 'items.tags.items', 'spans'
  FROM e WHERE len(list_filter(tags, t -> length(t) < 2)) > 0
UNION ALL
SELECT doc_id, 'items.items', 'mat'
  FROM m WHERE len(list_filter(inner_arr, x -> x < 0)) > 0
"""


def q_full_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE ENGINE FACADE, driver-graded end-to-end (round 4): one
    ``run_full_validation`` call over a staged documents table exercises
    every family through the FUSED one-scan aggregate path — row suite,
    exact salted uniqueness, broadcast-anti referential, per-group
    null-rate, and PSI/KS drift vs an in-query baseline. The oracle
    reproduces each family's violation set in SQL; value/arg/message are
    deliberately excluded (drift values are float strings — the discrete
    (doc_id, constraint_id, column) set is the portable contract, and the
    row COUNT pins per-occurrence uniqueness semantics)."""
    from schemasaurus_spark.engine import AggregateChecks, run_full_validation

    edges = [0.0, 100, 200, 300, 400, 500, 600]
    d = _t(spark, sf_dir, "documents")
    staged = d.select(
        (F.col("doc_id") % 450).cast("string").alias("doc_id2"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("xx"))
         .otherwise(F.col("lang")).alias("lang2"),
        F.col("n_chars"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("long"))
         .otherwise(F.col("n_chars")).alias("nc_nullable"),
    )
    # checkpointed-baseline stand-in: the staged frame's own histogram
    # under a 3x shift (groups x buckets rows — sketch-sized collect)
    shifted = staged.withColumn("n_chars", F.col("n_chars") * 3)
    baseline = spark.createDataFrame(
        [(r["group_key"], r["bucket"], r["count"]) for r in
         agg.histogram(shifted, "n_chars", edges, by="lang2").collect()],
        "group_key string, bucket int, count long")
    suite = dsl.Suite(id_column="doc_id2",
                      columns={"n_chars": [dsl.Maximum(400)]},
                      name="full_validation")
    res = run_full_validation(staged, suite, AggregateChecks(
        unique_key="doc_id2",
        sources_dim=d.select(F.col("lang").alias("lang2")).distinct(),
        ref_column="lang2",
        null_rate_max={"nc_nullable": 0.01},
        null_rate_by="lang2",
        drift_baseline=baseline,
        drift_edges=edges,
        drift_column="n_chars",
    ))
    return res.violations().select("doc_id", "constraint_id", "column")


SQL_FULL_VALIDATION = """
WITH s AS (
  SELECT CAST(doc_id % 450 AS VARCHAR) AS doc_id2,
         CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang2,
         n_chars,
         CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS nc
  FROM documents)
SELECT doc_id2 AS doc_id, 'maximum' AS constraint_id, 'n_chars' AS column
  FROM s WHERE n_chars > 400
UNION ALL
SELECT doc_id2, 'unique.doc_id', 'doc_id2'
  FROM (SELECT doc_id2, COUNT(*) AS c FROM s GROUP BY 1
        HAVING COUNT(*) > 1) dup,
       UNNEST(generate_series(2, dup.c)) AS g(occ)
UNION ALL
SELECT doc_id2, 'ref.lang2', 'lang2' FROM s
  WHERE lang2 IS NOT NULL
    AND lang2 NOT IN (SELECT DISTINCT lang FROM documents
                      WHERE lang IS NOT NULL)
UNION ALL
SELECT lang2, 'stats.null_rate', 'nc_nullable'
  FROM (SELECT lang2,
               SUM(CASE WHEN nc IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) AS r
        FROM s GROUP BY 1)
  WHERE r > 0.01
UNION ALL
SELECT lang2, 'drift.psi.n_chars', 'n_chars' FROM drift_stats
  WHERE psi > 0.2
UNION ALL
SELECT lang2, 'drift.ks.n_chars', 'n_chars' FROM drift_stats
  WHERE ks > 0.15
"""

# The drift predicate is computed SEMANTICALLY (round-4 review: a
# hardcoded every-group-drifts list couldn't catch drift-math bugs):
# the oracle rebuilds both histograms, applies the engine's exact
# eps-clamp + renormalize bucket math (_counts_to_probs), and emits a
# row only where PSI/KS exceed the thresholds. Floats only decide a
# far-from-threshold predicate, so cross-engine summation order is safe.
_FV_DRIFT_CTES = """
bucketize AS (
  SELECT lang2,
         CASE WHEN v < 0 THEN -1 WHEN v < 100 THEN 0 WHEN v < 200 THEN 1
              WHEN v < 300 THEN 2 WHEN v < 400 THEN 3 WHEN v < 500 THEN 4
              WHEN v < 600 THEN 5 ELSE 6 END AS bucket,
         which
  FROM (SELECT lang2, n_chars AS v, 'cur' AS which FROM s
        UNION ALL
        SELECT lang2, n_chars * 3 AS v, 'base' AS which FROM s)
  WHERE v IS NOT NULL),
hist AS (
  SELECT lang2, bucket, which, COUNT(*) AS c
  FROM bucketize GROUP BY 1, 2, 3),
grid AS (
  SELECT g.lang2, b.range AS bucket, w.which
  FROM (SELECT DISTINCT lang2 FROM s) g
  CROSS JOIN range(-1, 7) b
  CROSS JOIN (VALUES ('cur'), ('base')) AS w(which)),
filled AS (
  SELECT grid.lang2, grid.bucket, grid.which, COALESCE(hist.c, 0) AS c
  FROM grid LEFT JOIN hist
    ON hist.lang2 IS NOT DISTINCT FROM grid.lang2
   AND hist.bucket = grid.bucket
   AND hist.which = grid.which),
clamped AS (
  SELECT lang2, bucket, which,
         GREATEST(c * 1.0 / GREATEST(SUM(c) OVER (PARTITION BY lang2,
                                                  which), 1), 1e-6) AS p0
  FROM filled),
probs AS (
  SELECT lang2, bucket, which,
         p0 / SUM(p0) OVER (PARTITION BY lang2, which) AS p
  FROM clamped),
j AS (
  SELECT c.lang2, c.bucket, c.p AS q, b.p AS p
  FROM (SELECT * FROM probs WHERE which = 'cur') c
  JOIN (SELECT * FROM probs WHERE which = 'base') b
    ON b.lang2 IS NOT DISTINCT FROM c.lang2 AND b.bucket = c.bucket),
cum AS (
  SELECT lang2, bucket, q, p,
         SUM(q - p) OVER (PARTITION BY lang2 ORDER BY bucket) AS d
  FROM j),
drift_stats AS (
  SELECT lang2, SUM((q - p) * ln(q / p)) AS psi, MAX(ABS(d)) AS ks
  FROM cum GROUP BY 1)
"""

SQL_FULL_VALIDATION = SQL_FULL_VALIDATION.replace(
    "  FROM documents)", "  FROM documents),\n" + _FV_DRIFT_CTES.strip(), 1)


def q_tdigest_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (applyInPandas partial+merge) — approximate
    by design, so no exact SQL oracle; driver records rows-only."""
    from schemasaurus_spark.operators.sketch import tdigest_sketch

    return tdigest_sketch(_t(spark, sf_dir, "documents"), "n_chars",
                          by="lang", compression=32)


def q_tdigest_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradable t-digest accuracy bound (round-3 VERDICT #6): the
    sketch itself stays rows-only (approximate by design), but THIS query
    emits per-(lang, quantile) booleans |tdigest_q − exact_q| ≤ tol, with
    the exact side computed by Spark's exact ``percentile``. The oracle is
    the all-true table over the same (lang, quantile) grid — a hash match
    PROVES the sketch tracks the exact quantiles, not just its row shape.
    tol = max(10% of the exact value, 2.0): loose enough for a
    compression-64 digest, tight enough that a broken sketch (shifted
    CDF, dropped buckets) fails the gate."""
    from schemasaurus_spark.operators.sketch import (
        quantiles_from_sketch, tdigest_sketch)

    docs = _t(spark, sf_dir, "documents")
    sk = tdigest_sketch(docs, "n_chars", by="lang", compression=64)
    approx = quantiles_from_sketch(sk, [0.5, 0.95])
    exact = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("q50"),
        F.percentile("n_chars", F.lit(0.95)).alias("q95")).collect()

    def close(a, b):
        # b is None when a group's n_chars are all NULL — exact percentile
        # returns NULL and abs(a - b) would TypeError on the driver.
        return (a is not None and b is not None
                and abs(a - b) <= max(0.1 * abs(b), 2.0))

    rows = []
    for r in exact:
        lang = r["lang"]
        # pandas groupby keys null as NaN; normalize the lookup
        key = lang if lang is not None else next(
            (k for k in approx if k is None or (isinstance(k, float)
                                                and k != k)), None)
        a = approx.get(key, [None, None])
        rows.append((lang, "p50", close(a[0], r["q50"])))
        rows.append((lang, "p95", close(a[1], r["q95"])))
    return spark.createDataFrame(
        rows, "lang string, q string, within_tol boolean")


SQL_TDIGEST_ACCURACY = """
SELECT lang, q, TRUE AS within_tol
FROM (SELECT DISTINCT lang FROM documents)
CROSS JOIN (VALUES ('p50'), ('p95')) AS t(q)
"""


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode AND feature extraction in one graded entry
    (round-4 VERDICT #3: grade multimodal_features). Deterministic BMP/WAV
    payloads are built in the Arrow kernel, then (a) header-parsed back
    with pure struct/numpy (kind/width/height/sample_rate/n_samples) and
    (b) run through the extract_features mapInPandas kernel; the graded
    feature columns are the ones arithmetically derivable from doc_id:
    n_bytes = exact container size (54 + padded-row-bytes × height for
    BMP, 44 + 2·n_samples for WAV), rel_w/rel_h = feat[0]/feat[1]
    (width/1024 is EXACT in float32 for w ≤ 16 — no rounding, powers of
    two tie at any decimal width), duration_sec = feat[7] rounded to 6 dp
    (tie-free across the whole (sr, n_samples) grid — brute-force
    verified). The sha1/full-feat surface stays pinned by
    tests/test_multimodal.py."""
    from schemasaurus_spark.operators import multimodal as mm

    media = mm.attach_real_media(_t(spark, sf_dir, "documents"))
    info = mm.extract_media_info(media)
    feats = mm.extract_features(media).select("id", "n_bytes", "feat")
    is_bmp = F.col("kind") == "bmp"
    return info.join(feats, "id").select(
        "id", "kind", "width", "height", "sample_rate", "n_samples",
        "n_bytes",
        F.when(is_bmp, F.col("feat")[0].cast("double")).alias("rel_w"),
        F.when(is_bmp, F.col("feat")[1].cast("double")).alias("rel_h"),
        F.when(~is_bmp,
               F.round(F.col("feat")[7].cast("double"), 6))
         .alias("duration_sec"),
    )


SQL_MULTIMODAL = """
WITH m AS (
  SELECT doc_id AS id,
         doc_id % 2 = 0 AS is_bmp,
         CAST(4 + doc_id % 13 AS INT) AS w,
         CAST(4 + doc_id % 7 AS INT) AS h,
         CAST(8000 + (doc_id % 5) * 1000 AS INT) AS sr,
         CAST(100 + doc_id % 50 AS INT) AS ns
  FROM documents)
SELECT id,
       CASE WHEN is_bmp THEN 'bmp' ELSE 'wav' END AS kind,
       CASE WHEN is_bmp THEN w END AS width,
       CASE WHEN is_bmp THEN h END AS height,
       CASE WHEN NOT is_bmp THEN sr END AS sample_rate,
       CASE WHEN NOT is_bmp THEN ns END AS n_samples,
       CASE WHEN is_bmp
            THEN 54 + CAST(floor((w * 3 + 3) / 4) * 4 AS BIGINT) * h
            ELSE 44 + 2 * CAST(ns AS BIGINT) END AS n_bytes,
       CASE WHEN is_bmp THEN CAST(w AS DOUBLE) / 1024 END AS rel_w,
       CASE WHEN is_bmp THEN CAST(h AS DOUBLE) / 1024 END AS rel_h,
       CASE WHEN NOT is_bmp
            THEN ROUND(CAST(ns AS DOUBLE) / sr, 6) END AS duration_sec
FROM m
"""


OFFICIAL_CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "official_draft4")


def q_official_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vendored official JSON-Schema-Test-Suite corpus (313 native-
    format draft-4 tests) through the engine's real translation + batched
    execution path (official_suite.py; reference analog
    test/official_suite_spec.js:9-51), emitting one row per GRADED test.
    Skips (reference ignore-list + documented divergences) are offline-
    determinable — is_ignored + plan_test raise without Spark — so the
    DuckDB oracle enumerates exactly the graded tests, each expected
    ``passed=true``. The corpus is fixed, so this is independent of
    sf_dir."""
    from schemasaurus_spark.official_suite import (
        load_official_suite, run_official_tests)

    tests = load_official_suite(OFFICIAL_CORPUS_DIR)
    res = run_official_tests(spark, tests)
    rows = [(t.file, t.case, t.test, True) for t in res.passed]
    rows += [(t.file, t.case, t.test, False) for t, _ in res.failed]
    return spark.createDataFrame(
        rows, "file string, case_desc string, test_desc string, "
              "passed boolean")


def _official_suite_oracle_sql() -> str:
    """Static VALUES oracle over the graded subset (built once at import
    from the corpus files — pure Python, no Spark)."""
    from schemasaurus_spark.official_suite import (
        REFERENCE_IGNORED, _Untypeable, is_ignored, load_official_suite,
        plan_test)
    from schemasaurus_spark.schema_json import SchemaTranslationError

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = []
    for t in load_official_suite(OFFICIAL_CORPUS_DIR):
        if is_ignored(t, REFERENCE_IGNORED):
            continue
        try:
            plan_test(t)
        except (_Untypeable, SchemaTranslationError):
            continue
        rows.append(f"({q(t.file)}, {q(t.case)}, {q(t.test)}, TRUE)")
    return ("SELECT file, case_desc, test_desc, passed FROM (VALUES\n"
            + ",\n".join(rows)
            + "\n) AS t(file, case_desc, test_desc, passed)")


# -------------------------------------------------------------- registry


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "validate_documents": q_validate_documents,
    "verdict_by_source": q_verdict_by_source,
    "stats_documents": q_stats_documents,
    "stats_quantiles": q_stats_quantiles,
    "unique_user_events": q_unique_user_events,
    "ref_lang": q_ref_lang,
    "hist_nchars": q_hist_nchars,
    "oneof_nchars": q_oneof_nchars,
    "dependency_lang_source": q_dependency_lang_source,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "top_tokens": q_top_tokens,
    "unigram_logprob": q_unigram_logprob,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "winnow_fingerprints": q_winnow_fingerprints,
    "pii_signals": q_pii_signals,
    "dedup_exact": q_dedup_exact,
    "decontaminate": q_decontaminate,
    "dedup_prefix_buckets": q_dedup_prefix_buckets,
    "minhash_lsh": q_minhash_lsh,
    "jaccard_pairs": q_jaccard_pairs,
    "dedup_clusters": q_dedup_clusters,
    "ann_topk": q_ann_topk,
    "ann_knn_join": q_ann_knn_join,
    "repetition_signals": q_repetition_signals,
    "sign_lsh": q_sign_lsh,
    "tpch_q1": q_tpch_q1,
    "violation_rank": q_violation_rank,
    "events_daily": q_events_daily,
    "events_json": q_events_json,
    "simhash": q_simhash,
    "embedding_neardup": q_embedding_neardup,
    "normalize_roundtrip": q_normalize_roundtrip,
    "drift_psi": q_drift_psi,
    "events_tumbling": q_events_tumbling,
    "rollup_docs": q_rollup_docs,
    "sessionize_events": q_sessionize_events,
    "jsonschema_validate": q_jsonschema_validate,
    "validate_spans": q_validate_spans,
    "validate_nested": q_validate_nested,
    "full_validation": q_full_validation,
    "validate_lineitem": q_validate_lineitem,
    "salted_events_stats": q_salted_events_stats,
    "docs_except": q_docs_except,
    "ann_ivf": q_ann_ivf,
    "tdigest_accuracy": q_tdigest_accuracy,
    "multimodal": q_multimodal,
    "official_suite": q_official_suite,
    # q_tdigest_ntok (raw sketch, approximate by design) stays pytest-only:
    # the driver grades exactly 50 registry entries (round-4 VERDICT #1)
    # and its accuracy is already oracle-bounded by tdigest_accuracy.
}

from schemasaurus_spark.conformance import (  # noqa: E402
    CONFORMANCE_ORACLES, CONFORMANCE_QUERIES,
)

QUERIES.update(CONFORMANCE_QUERIES)

ORACLES: dict[str, str] = {
    "validate_documents": SQL_VALIDATE_DOCUMENTS,
    "verdict_by_source": SQL_VERDICT_BY_SOURCE,
    "stats_documents": SQL_STATS_DOCUMENTS,
    "stats_quantiles": SQL_STATS_QUANTILES,
    "unique_user_events": SQL_UNIQUE_USER_EVENTS,
    "ref_lang": SQL_REF_LANG,
    "hist_nchars": SQL_HIST_NCHARS,
    "oneof_nchars": SQL_ONEOF_NCHARS,
    "dependency_lang_source": SQL_DEPENDENCY_LANG_SOURCE,
    "token_count": SQL_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "top_tokens": SQL_TOP_TOKENS,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "pii_signals": SQL_PII_SIGNALS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "decontaminate": SQL_DECONTAMINATE,
    "dedup_prefix_buckets": SQL_DEDUP_PREFIX_BUCKETS,
    "minhash_lsh": SQL_MINHASH_LSH,
    "jaccard_pairs": SQL_JACCARD_PAIRS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "ann_topk": SQL_ANN_TOPK,
    "ann_knn_join": SQL_ANN_KNN_JOIN,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "sign_lsh": SQL_SIGN_LSH,
    "tpch_q1": SQL_TPCH_Q1,
    "violation_rank": SQL_VIOLATION_RANK,
    "events_daily": SQL_EVENTS_DAILY,
    "events_json": SQL_EVENTS_JSON,
    "simhash": SQL_SIMHASH,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "normalize_roundtrip": SQL_NORMALIZE_ROUNDTRIP,
    "drift_psi": SQL_DRIFT_PSI,
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "rollup_docs": SQL_ROLLUP_DOCS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "jsonschema_validate": SQL_JSONSCHEMA_VALIDATE,
    "validate_spans": SQL_VALIDATE_SPANS,
    "validate_nested": SQL_VALIDATE_NESTED,
    "full_validation": SQL_FULL_VALIDATION,
    "validate_lineitem": SQL_VALIDATE_LINEITEM,
    "salted_events_stats": SQL_SALTED_EVENTS_STATS,
    "docs_except": SQL_DOCS_EXCEPT,
    "ann_ivf": SQL_ANN_IVF,
    "tdigest_accuracy": SQL_TDIGEST_ACCURACY,
    "multimodal": SQL_MULTIMODAL,
    # official_suite: corpus-generated, inserted lazily by build_oracles()
}

ORACLES.update(CONFORMANCE_ORACLES)


def build_oracles() -> dict:
    """ORACLES with the corpus-generated ``official_suite`` entry filled
    in on first call. Building that SQL reads tests/data/official_draft4
    and runs ~313 plan_test translations — lazy so that importing the
    library (including from the zip-packaged cluster deliverable, which
    ships no tests/ tree) costs nothing and cannot fail on a missing
    corpus; only actually grading official_suite needs the files."""
    if "official_suite" not in ORACLES:
        ORACLES["official_suite"] = _official_suite_oracle_sql()
    return ORACLES
