#!/usr/bin/env python
"""Noop-sink isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual registry queries with the same session/config as bench.py,
splitting driver-side plan construction from execution, best-of-N fresh
plans. Cited by OPTIMIZATION_r06.md; bench.py stays the measurement
contract.

Usage: python bench_extra.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_ATTEMPTS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from schemasaurus_spark.session import get_spark
    from schemasaurus_spark.queries import QUERIES

    raw = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpus = (os.cpu_count() or 32) if raw == "*" else int(raw)
    attempts = max(1, int(os.environ.get("BENCH_EXTRA_ATTEMPTS", "3")))
    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        for _ in range(attempts):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t_exec = time.time() - t1
            rec = {"build_s": round(t_build, 3), "exec_s": round(t_exec, 3),
                   "total_s": round(t_build + t_exec, 3)}
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(json.dumps({name: best}), flush=True)
    print(json.dumps({"sf": SF_DIR, "cpus": cpus, "attempts": attempts,
                      "results": out}))


if __name__ == "__main__":
    main()
