#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed to full materialization (count of the result — results
stay distributed, nothing is collected). Spark session boot is excluded.

Stall-aware capture: this VM exhibits wandering whole-machine stalls AND
hours-long degraded windows (kernel sys-time storms on shuffle/python-heavy
work, documented in BENCH/BASELINE.md). Every pass is bracketed by a FIXED
calibration micro-query (one shuffle leg + one pandas-UDF leg — the two
pathology surfaces); a pass counts as QUIET only when both brackets land
inside the band ``max(2.5 × floor, floor + 1 s)`` of the calibration floor.
Per-query headline numbers are the min over quiet passes; capture keeps
adding passes (up to a cap) until the target number of quiet passes has
landed, so the recorded artifact defends itself: the calibration walls in
``calibration.per_pass`` show exactly which passes hit a degraded machine
window.

Two lessons from a sustained-degraded capture are folded in via the
committed reference floors in ``BENCH/calibration_floor.json``:
 1. the session's own measured floor self-references — a session measured
    INSIDE an hours-long degraded window certifies itself quiet against its
    own inflated floor. The effective floor is therefore
    ``min(session floor, committed quiet-window floor)``.
 2. bracketing probes can straddle a stall that lands mid-pass on a heavy
    query. Each query wall is therefore also checked against its committed
    quiet-window floor with the same band rule; a pass is quiet only if the
    brackets AND every query wall are in band.
If no quiet pass lands within the cap, the artifact reports the min over
all passes with ``quiet_passes: 0`` and ``degraded: true`` — the number is
recorded, and flagged as a machine-window ceiling rather than a code cost.
(A deliberate code change that slows a headline query should re-record the
reference floors — see the json's provenance note.)
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
    # round-4 families folded into the calibrated capture (r4-verdict item
    # 2): the heaviest KG-downstream and curation queries, each including
    # its full upstream pipeline run
    "kg_infer_canonical",    # A-F + rule inference over canonical triples
    "kg_transe",             # KG-embedding training (2 full-batch iters)
    "kg_communities",        # label propagation over the extracted graph
    "training_pipeline",     # dedup -> classify -> mix -> pack, one plan
    "paragraph_dedup",       # corpus-wide first-occurrence winner
]


def _calibration(spark, cpus: int) -> float:
    """Fixed micro-job touching both stall surfaces: a hash-shuffle
    aggregation (shuffle-file writes) and a tiny Arrow/pandas round-trip
    (python worker pool). ~0.5-1 s quiet; 5-20 s inside a stall window."""
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    t0 = time.time()
    spark.range(1_000_000, numPartitions=cpus).groupBy(
        (F.col("id") % 97).alias("k")
    ).count().count()
    probe = F.pandas_udf(lambda s: s * 2.0, T.DoubleType())
    spark.range(cpus * 5_000, numPartitions=cpus).select(
        probe(F.col("id").cast("double"))
    ).count()
    return round(time.time() - t0, 3)


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

    # session calibration floor: min of 3 back-to-back probes, clamped by
    # the committed quiet-window floor (a degraded session must not
    # self-certify against its own inflated floor)
    session_floor = min(_calibration(spark, cpus) for _ in range(3))
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        "calibration_floor.json",
    )
    query_floor: dict[str, float] = {}
    cal_floor = session_floor
    if os.path.exists(ref_path):
        with open(ref_path) as fh:
            ref = json.load(fh)
        cal_floor = min(session_floor, float(ref["floor_sec"]))
        query_floor = {
            k: float(v) for k, v in ref.get("query_floor_sec", {}).items()
        }
    cal_band = round(max(2.5 * cal_floor, cal_floor + 1.0), 3)

    def _query_quiet(name: str, wall: float) -> bool:
        ref_f = query_floor.get(name)
        if ref_f is None:
            return True
        return wall <= max(2.5 * ref_f, ref_f + 1.0)

    target_quiet = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    max_passes = int(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_PASSES", str(target_quiet * 2))
    )
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    cal_per_pass: list[list[float]] = []
    quiet_flags: list[bool] = []
    n_quiet = 0
    for _ in range(max_passes):
        cal_pre = _calibration(spark, cpus)
        pass_walls: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.time()
            rows[name] = qs[name](spark, sf_dir).count()
            pass_walls[name] = round(time.time() - t0, 3)
            raw[name].append(pass_walls[name])
            # drop the query's leaked DISK_ONLY localCheckpoint RDDs now:
            # cleanup is reference-driven and async, and with 12 heavy
            # queries per pass the accumulated blocks measurably degrade
            # later queries (observed 9.6s -> 52.8s on kg_infer_canonical
            # behind a long session)
            import gc  # noqa: PLC0415

            gc.collect()
        cal_post = _calibration(spark, cpus)
        cal_per_pass.append([cal_pre, cal_post])
        quiet = (
            cal_pre <= cal_band
            and cal_post <= cal_band
            and all(_query_quiet(n, w) for n, w in pass_walls.items())
        )
        quiet_flags.append(quiet)
        n_quiet += quiet
        if n_quiet >= target_quiet:
            break

    # per-query min over QUIET passes (all passes if none were quiet — the
    # flags in the artifact then say exactly why the number is suspect)
    use = [i for i, q in enumerate(quiet_flags) if q] or list(
        range(len(quiet_flags))
    )
    timings = {
        name: min(raw[name][i] for i in use) for name in HEADLINE
    }

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
                "passes": len(quiet_flags),
                "quiet_passes": sum(quiet_flags),
                "degraded": not any(quiet_flags),
                "calibration": {
                    "floor_sec": cal_floor,
                    "session_floor_sec": session_floor,
                    "band_sec": cal_band,
                    "per_pass": cal_per_pass,
                    "quiet": quiet_flags,
                },
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
