#!/usr/bin/env python
"""Task-granularity experiment for the scaling job's fixed floor.

The stage-metrics probe shows the 16-core A-D leg paying ~5.5 s of wall
above its perfectly-packed task-sum bound (64 tasks = 4 waves/core; task
spread 12.5 -> 17.4 s), while the 4-core leg pays proportionally less —
wave-quantization + straggler tail is the level-ASYMMETRIC part of the
per-job floor. Finer tasks let the scheduler route around a stalled core
(loss capped at stall/cores instead of a whole wave).

Times the stages A-D job at one parallelism level for several skeleton
partition multipliers (waves/core). min-of-PASSES per variant.

    taskset -c 0-15 python scripts/granularity_probe.py --cpus 16 \
        --replicate 1024 --mults 4,8,16
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=1024)
    ap.add_argument("--mults", default="4,8,16")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from pyspark.storagelevel import StorageLevel

    from autoextraction_spark import corpus
    from autoextraction_spark.operators import detect, output, slot_fill
    from autoextraction_spark.session import get_spark

    spark = get_spark(app_name=f"granularity-{args.cpus}", cpus=args.cpus)

    def job(skel) -> int:
        txt = corpus.pages_from_skeleton(skel, with_text=True, emit_html=False)
        det = detect.detect_relations(txt)
        completed = slot_fill.ordered_slot_fill(
            det, carry_text=False, dedup_assignments=True
        )
        return output.to_triples(
            output.completed_filter(completed), assume_unique=True
        ).count()

    # warm-up: spawn the python worker pool on a small corpus
    warm = corpus.doc_skeleton(spark, args.sf_dir, min(args.replicate, 64))
    job(warm.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY))

    results = {}
    for mult in [int(m) for m in args.mults.split(",")]:
        skel = (
            corpus.doc_skeleton(spark, args.sf_dir, args.replicate)
            .repartition(args.cpus * mult)
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )
        walls = []
        for _ in range(args.passes):
            t0 = time.time()
            n = job(skel)
            walls.append(round(time.time() - t0, 2))
        results[mult] = {"walls": walls, "wall": min(walls), "triples": n}
        print(json.dumps({"mult": mult, **results[mult]}), flush=True)
        skel.unpersist()
    print(json.dumps({"cpus": args.cpus, "replicate": args.replicate,
                      "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
