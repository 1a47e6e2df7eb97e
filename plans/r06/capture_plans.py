#!/usr/bin/env python
"""Capture .explain("formatted") output for round-6 plan evidence.

Usage: python plans/r06/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
round-6 touched set). Run from the repo root; uses sf0.1 (plan SHAPE is
sf-independent; only stats annotations differ).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

TOUCHED = [
    "decontaminate", "winnow_fingerprints", "dedup_exact", "minhash_lsh",
    "simhash", "jaccard_pairs", "text_quality", "token_count",
    "events_json", "unique_user_events", "embedding_neardup",
    "validate_documents", "validate_spans", "validate_nested",
    "full_validation", "validate_lineitem",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or TOUCHED
    from schemasaurus_spark.session import get_spark
    from schemasaurus_spark.queries import QUERIES

    spark = get_spark("plans_r06", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = QUERIES[name](spark, sf)
        qe = df._jdf.queryExecution()
        txt = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "written")


if __name__ == "__main__":
    main()
