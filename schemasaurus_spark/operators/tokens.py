"""Token-sequence layout constraints for pre-tokenized training data.

The north-star input is ``(doc_id, tokens array<int>, n_tok, source)``
(BASELINE.json input_hint); beyond per-element range checks (plain
``dsl.Items``), a tokenized corpus has LAYOUT invariants the generic
keywords can't name: BOS first, EOS closing the content, padding only as
a suffix. Each helper below returns a stock :class:`dsl.Conform` whose
``expr`` is a pure Catalyst expression builder — the checks ride the
engine's single validation projection (zero shuffle, codegen, streaming/
quarantine/lineage for free) and follow the engine's null-guard
convention (a NULL tokens column is ``required``'s business, not
layout's).

ANSI-safety: Spark 4 defaults ``spark.sql.ansi.enabled=true``, where
``element_at`` THROWS on out-of-bounds — every index access here uses
``try_element_at`` (NULL instead), and NULL predicates coalesce to
violations, which is exactly right: an EMPTY sequence has no BOS/EOS and
is reported, not crashed on.

Reference analog: these are ``[conform]`` registry entries
(v4validator.js:310-322) specialized to the token-sequence domain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemasaurus_spark import dsl

__all__ = ["bos_check", "eos_check", "pad_tail_check", "vocab_range",
           "len_consistency", "sequence_layout_suite"]


def bos_check(bos_id: int) -> dsl.Conform:
    """First token must be ``bos_id`` (empty sequences violate: no first
    token is no BOS). Code ``custom.bos``."""
    return dsl.Conform(
        name="bos",
        expr=lambda c: F.try_element_at(c, F.lit(1)) == F.lit(bos_id))


def eos_check(eos_id: int, pad_id: int | None = None) -> dsl.Conform:
    """Last CONTENT token must be ``eos_id``. With ``pad_id`` the content
    is everything before the first pad (layout ``[BOS, …, EOS, PAD…]``);
    an all-pad sequence has no content and violates. Code ``custom.eos``."""
    if pad_id is None:
        return dsl.Conform(
            name="eos",
            expr=lambda c: F.try_element_at(c, F.lit(-1)) == F.lit(eos_id))

    def expr(c):
        pos = F.array_position(c, F.lit(pad_id))  # 1-based, 0 = absent
        last_content = (
            F.when(pos == 0, F.try_element_at(c, F.lit(-1)))
             .when(pos > 1, F.try_element_at(c, (pos - 1).cast("int"))))
        # pos == 1 (pad-first) falls through to NULL -> violation
        return last_content == F.lit(eos_id)
    return dsl.Conform(name="eos", expr=expr)


def pad_tail_check(pad_id: int) -> dsl.Conform:
    """Padding may only appear as a suffix: everything from the FIRST pad
    onward must be pad (an interior pad truncates attention masks built
    from it). Pad-free sequences pass. Code ``custom.pad_tail``."""
    def expr(c):
        pos = F.array_position(c, F.lit(pad_id))
        tail = F.slice(c, pos.cast("int"),
                       F.greatest(F.size(c) - pos.cast("int") + 1,
                                  F.lit(0)).cast("int"))
        return (F.when(pos == 0, F.lit(True))
                 .otherwise(F.forall(tail, lambda e: e == F.lit(pad_id))))
    return dsl.Conform(name="pad_tail", expr=expr)


def vocab_range(vocab_size: int, min_id: int = 0,
                extract_offenders: bool = True) -> dsl.Items:
    """Every token id in ``[min_id, vocab_size)`` — plain ``dsl.Items``
    bounds (static DCE, offender extraction, the usual machinery); here
    only for composition convenience."""
    return dsl.Items(constraints=[dsl.Minimum(min_id),
                                  dsl.Maximum(vocab_size - 1)],
                     extract_offenders=extract_offenders)


def len_consistency(n_tok_col: str = "n_tok") -> dsl.Conform:
    """``size(tokens) == n_tok`` — the cross-field invariant
    (ctx.parent analog). Code ``custom.len_eq``."""
    return dsl.Conform(name="len_eq",
                       expr=lambda c, n: F.size(c) == n,
                       extra_cols=[n_tok_col])


def sequence_layout_suite(vocab_size: int, bos_id: int, eos_id: int,
                          pad_id: int | None = None,
                          id_column: str = "doc_id",
                          tokens_col: str = "tokens",
                          name: str = "sequence_layout") -> dsl.Suite:
    """The composed pre-training-corpus layout suite: required + vocab
    range + BOS/EOS(+pad-suffix) layout + length consistency — ONE
    projection over the scan like any other suite."""
    cons: list = [dsl.NotNull(), dsl.MinItems(1),
                  vocab_range(vocab_size),
                  bos_check(bos_id), eos_check(eos_id, pad_id),
                  len_consistency()]
    if pad_id is not None:
        cons.append(pad_tail_check(pad_id))
    return dsl.Suite(name=name, id_column=id_column,
                     columns={id_column: [dsl.NotNull()],
                              tokens_col: cons})
