#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed to full materialization (count of the result — results
stay distributed, nothing is collected). Spark session boot is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_triples",            # stages A-D: extraction -> ordered slot filling
    "kg_triples_canonical",  # stages A-F incl. linking + CC
    "minhash_dedup",
    "simhash",
    "tpch_q1",
    "vocab_topk",
    "cooccur_pairs",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from autoextraction_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)
    qs = entrymod.queries()

    # untimed: spawn the full python-worker pool (a one-time per-executor
    # cost on a real cluster; ~0.5s/worker of kernel time in this sandbox
    # that would otherwise land inside the first query's timing)
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    warm = F.pandas_udf(lambda s: s * 1.0, T.DoubleType())
    spark.range(cpus * 20000, numPartitions=cpus * 2).select(
        warm(F.col("id").cast("double"))
    ).count()

    # min-of-N per query: this VM exhibits wandering 10-20s whole-machine
    # stalls (kernel sys-time storms, documented in BENCH/BASELINE.md); the
    # min over full passes measures the plan, not the stall lottery. Three
    # passes since the round-3 recompute fixes cut query walls ~40% — a
    # stall now has to land on the same query three times to pollute a min.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    for _ in range(passes):
        for name in HEADLINE:
            t0 = time.time()
            rows[name] = qs[name](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            raw[name].append(dt)
            timings[name] = min(timings.get(name, dt), dt)

    # throughput numbers for the scaling story
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    kg_wall = timings["kg_triples"]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "rows": rows,
                "docs_per_sec": round(n_docs / kg_wall, 2) if kg_wall else None,
                "triples_per_sec": round(rows["kg_triples"] / kg_wall, 2)
                if kg_wall
                else None,
                "cpus": cpus,
                "passes": passes,
                # full per-pass spread (min-of-N understates steady-state
                # latency; readers can see the floor AND the band — ADVICE.md)
                "raw_sec": raw,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
