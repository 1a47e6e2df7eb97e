#!/usr/bin/env python
"""Two-parallelism scaling evidence (north rule: efficiency ≥ 0.8 N→4N).

Runs the identical sequences-validation job at local[8] and local[32] on the
SAME parquet input, each in a fresh JVM (subprocess), computes
efficiency = (throughput@32 / throughput@8) / 4 and appends the numbers to
BENCH.md. Sandbox stand-in for two cluster sizes per BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = str(cores)
from schemasaurus_spark.session import get_spark
import bench
spark = get_spark("scaling", master=f"local[{cores}]", shuffle_partitions=max(cores, 32),
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)})
spark.sparkContext.setLogLevel("ERROR")
path = bench.ensure_sequences(spark, bench.SEQ_ROWS, 256)
# warm-up (JIT + page cache), then 2 timed runs, each with a FRESH plan:
# re-collecting one Dataset would skip its completed shuffle stages and
# time only the final agg. Plan-build (~1s serial) is amortized by input
# size, mirroring production where one plan scans TBs.
bench.run_sequences_bench(spark, path)
runs = [bench.run_sequences_bench(spark, path) for _ in range(2)]
best = max(runs, key=lambda r: r["sequences_per_sec"])
best.pop("_prebuilt", None)
print("RESULT " + json.dumps(best))
"""


def run_at(cores: int) -> dict:
    """One 'cluster size': `taskset` pins the process tree to exactly
    `cores` CPUs (otherwise JVM GC/JIT threads scale with the MACHINE's
    cores and the small run borrows extra CPUs), and the heap scales with
    cores (1 GiB/core) the way a real 4N-executor cluster carries 4x the
    memory."""
    code = CHILD % {"repo": REPO}
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{cores}g")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
         str(cores)],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT at {cores} cores:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    r8 = run_at(8)
    r32 = run_at(32)
    eff = (r32["sequences_per_sec"] / r8["sequences_per_sec"]) / 4.0
    result = {
        "rows": r8["rows"],
        "throughput_8_cores": r8["sequences_per_sec"],
        "throughput_32_cores": r32["sequences_per_sec"],
        "wall_8": r8["wall_s"],
        "wall_32": r32["wall_s"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "meets_0.8_bar": eff >= 0.8,
    }
    print(json.dumps(result))
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    block = (
        f"\n## Scaling evidence ({stamp})\n\n"
        f"Identical full-suite validation job (1M-row sequences table, parquet input)\n"
        f"at two parallelism levels, fresh JVM each (sandbox stand-in for N vs 4N executors):\n\n"
        f"| cores | wall (s) | validated sequences/sec |\n|---|---|---|\n"
        f"| 8 (N) | {r8['wall_s']} | {r8['sequences_per_sec']:,.0f} |\n"
        f"| 32 (4N) | {r32['wall_s']} | {r32['sequences_per_sec']:,.0f} |\n\n"
        f"**Scaling efficiency (32 vs 8) / 4 = {eff:.3f}** "
        f"({'meets' if eff >= 0.8 else 'BELOW'} the >=0.8 north-rule bar).\n"
    )
    with open(Path(REPO) / "BENCH.md", "a") as f:
        f.write(block)


if __name__ == "__main__":
    main()
