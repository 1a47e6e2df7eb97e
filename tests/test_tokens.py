"""Token-sequence layout constraints (operators/tokens.py): BOS/EOS/pad
layout + vocab range as stock Conform/Items entries riding the single
validation projection."""

import pyspark.sql.functions as F

from schemasaurus_spark import dsl
from schemasaurus_spark.operators.tokens import (
    bos_check, eos_check, len_consistency, pad_tail_check,
    sequence_layout_suite, vocab_range,
)
from schemasaurus_spark.validate import validate

BOS, EOS, PAD, VOCAB = 1, 2, 0, 1000


def _seqs(spark, rows):
    """rows: list of (doc_id, tokens)."""
    df = spark.createDataFrame(
        [(d, t, len(t) if t is not None else None) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int")
    return df


def _codes(res):
    return {(r["doc_id"], r["constraint_id"])
            for r in res.violations().collect()}


def test_layout_suite_clean_and_corrupted(spark):
    df = _seqs(spark, [
        ("ok-plain", [BOS, 7, 8, EOS]),
        ("ok-padded", [BOS, 7, EOS, PAD, PAD]),
        ("no-bos", [7, 8, EOS]),
        ("no-eos", [BOS, 7, 8]),
        ("interior-pad", [BOS, 7, PAD, 8, EOS, PAD]),
        ("oov", [BOS, 7, 5000, EOS]),
        ("empty", []),
        ("all-pad", [PAD, PAD]),
    ])
    suite = sequence_layout_suite(VOCAB, BOS, EOS, PAD)
    res = validate(df, suite)
    got = _codes(res)
    assert ("ok-plain", "custom.bos") not in got
    assert not any(d in ("ok-plain", "ok-padded") for d, _ in got)
    assert ("no-bos", "custom.bos") in got
    assert ("no-eos", "custom.eos") in got
    # interior pad: pad_tail fires; eos ALSO fires (content before first
    # pad ends in 7, not EOS) — both are real layout defects
    assert ("interior-pad", "custom.pad_tail") in got
    assert ("interior-pad", "custom.eos") in got
    assert ("oov", "items.maximum") in got
    assert ("empty", "custom.bos") in got and ("empty", "minItems") in got
    assert ("all-pad", "custom.eos") in got and ("all-pad", "custom.bos") in got


def test_eos_without_pad_mode(spark):
    df = _seqs(spark, [("a", [BOS, 5, EOS]), ("b", [BOS, 5, 6])])
    res = validate(df, dsl.Suite(columns={"tokens": [eos_check(EOS)]}))
    assert _codes(res) == {("b", "custom.eos")}


def test_null_tokens_skip_layout_checks(spark):
    """Engine null-guard convention: NULL column -> only `required`."""
    df = _seqs(spark, [("n", None)])
    suite = dsl.Suite(columns={"tokens": [dsl.NotNull(), bos_check(BOS),
                                          eos_check(EOS, PAD),
                                          pad_tail_check(PAD)]})
    res = validate(df, suite)
    assert {c for _, c in _codes(res)} == {"required"}


def test_len_consistency_cross_field(spark):
    df = spark.createDataFrame(
        [("a", [BOS, EOS], 2), ("b", [BOS, EOS], 5)],
        "doc_id string, tokens array<int>, n_tok int")
    res = validate(df, dsl.Suite(columns={"tokens": [len_consistency()]}))
    assert _codes(res) == {("b", "custom.len_eq")}


def test_layout_plan_is_single_projection(spark):
    df = _seqs(spark, [("a", [BOS, 5, EOS])])
    suite = sequence_layout_suite(VOCAB, BOS, EOS, PAD)
    plan = (validate(df, suite).validated._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_range_extracts_offenders(spark):
    df = _seqs(spark, [("a", [BOS, -3, 5000, EOS])])
    res = validate(df, dsl.Suite(columns={"tokens": [vocab_range(VOCAB)]}))
    vals = {(r["constraint_id"], r["value"])
            for r in res.violations().collect()}
    assert ("items.minimum", "-3") in vals
    assert ("items.maximum", "5000") in vals
