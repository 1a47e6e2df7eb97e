"""Suite-walker (newIterator analog) tests — traversal order, custom
visitors, and the two derived tools."""

from schemasaurus_spark import dsl
from schemasaurus_spark.plans.suite_tools import (
    SuiteVisitor, suite_to_ddl, suite_to_markdown, walk_suite,
)


def _suite():
    return dsl.Suite(
        id_column="doc_id",
        columns={
            "doc_id": [dsl.NotNull(), dsl.Pattern(r"^[a-z]+-[0-9]{8}$")],
            "n_tok": [dsl.Minimum(1), dsl.Maximum(2048)],
        },
        row=[("tokens", dsl.Conform(name="size_eq", expr=lambda c: c))],
        name="docs",
    )


def test_walk_order_matches_declaration_order():
    """Traversal-order parity (compiler.js:156-173): events fire in
    declaration order with start/end bracketing (matchers.js modifiers)."""
    events = []

    class Recorder(SuiteVisitor):
        def begin(self, s): events.append("begin")
        def column_start(self, n): events.append(f"start:{n}")
        def constraint(self, col, c): events.append(f"c:{col}:{c.code}")
        def column_end(self, n): events.append(f"end:{n}")
        def row_constraint(self, l, c): events.append(f"row:{l}:{c.code}")
        def end(self, s): events.append("end"); return events

    out = walk_suite(_suite(), Recorder())
    assert out == [
        "begin",
        "start:doc_id", "c:doc_id:required", "c:doc_id:pattern", "end:doc_id",
        "start:n_tok", "c:n_tok:minimum", "c:n_tok:maximum", "end:n_tok",
        "row:tokens:custom.size_eq",
        "end",
    ]


def test_markdown_tool():
    md = suite_to_markdown(_suite())
    assert "# Constraint suite `docs`" in md
    assert "## `n_tok`" in md
    assert "**minimum** — shall be >= 1" in md
    assert "cross-field on `tokens`" in md


def test_ddl_tool():
    ddl = suite_to_ddl(_suite(), table="seq")
    assert ddl.startswith("CREATE TABLE seq (")
    assert "doc_id STRING NOT NULL" in ddl
    assert "n_tok INT" in ddl and "shall be <= 2048" in ddl
    assert "-- cross-field [tokens] custom.size_eq" in ddl


def test_walker_item_events():
    """:item/:item-end events fire around element-schema constraints
    (matchers.js:3-63; processor.js:43-47 schemaOnly item iteration)."""
    from schemasaurus_spark import dsl
    from schemasaurus_spark.plans.suite_tools import SuiteVisitor, walk_suite

    events = []

    class Rec(SuiteVisitor):
        def constraint(self, column, c):
            events.append(("c", column, c.code))

        def item_start(self, column, index):
            events.append(("item", column, index))

        def item_end(self, column, index):
            events.append(("item-end", column, index))

    suite = dsl.Suite(columns={
        "toks": [dsl.MinItems(1),
                 dsl.Items([dsl.Minimum(0), dsl.Maximum(9)])],
        "tup": [dsl.TupleItems([[dsl.Enum(["a"])], [dsl.Minimum(1)]])],
    })
    walk_suite(suite, Rec())
    assert events == [
        ("c", "toks", "minItems"),
        ("c", "toks", "items"),
        ("item", "toks", None),
        ("c", "toks", "minimum"), ("c", "toks", "maximum"),
        ("item-end", "toks", None),
        ("c", "tup", "items"),
        ("item", "tup", 0), ("c", "tup", "enum"), ("item-end", "tup", 0),
        ("item", "tup", 1), ("c", "tup", "minimum"), ("item-end", "tup", 1),
    ]


def test_markdown_renders_item_constraints():
    from schemasaurus_spark import dsl
    from schemasaurus_spark.plans.suite_tools import suite_to_markdown

    md = suite_to_markdown(dsl.Suite(columns={
        "toks": [dsl.Items([dsl.Minimum(0)])]}))
    assert "each item" in md and "minimum" in md
