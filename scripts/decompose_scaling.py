#!/usr/bin/env python
"""Stage-level decomposition of the scaling job (stages A-D).

Times cumulative prefixes of the pipeline at one parallelism level —
generation+extraction only, +detect, +slot-fill, +triples distinct — so the
difference between consecutive rows isolates each stage's marginal wall.
Run at two levels to see WHICH stage stops scaling:

    python scripts/decompose_scaling.py --cpus 8  --replicate 1024
    python scripts/decompose_scaling.py --cpus 32 --replicate 1024

Each prefix is measured min-of-N (default 2) with an untimed warm-up, same
protocol as scripts/scaling.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=1024)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from autoextraction_spark import corpus
    from autoextraction_spark.operators import detect, output, slot_fill
    from autoextraction_spark.session import get_spark

    spark = get_spark(app_name=f"decompose-{args.cpus}", cpus=args.cpus)

    def gen():
        return corpus.web_pages(
            spark, args.sf_dir, replicate=args.replicate, with_text=True,
            emit_html=False,
        )

    prefixes = {
        "gen_extract": lambda: gen().count(),
        "plus_detect": lambda: detect.detect_relations(gen()).count(),
        "plus_slot_fill": lambda: slot_fill.ordered_slot_fill(
            detect.detect_relations(gen()), carry_text=False
        ).count(),
        "plus_triples_distinct": lambda: output.to_triples(
            output.completed_filter(
                slot_fill.ordered_slot_fill(
                    detect.detect_relations(gen()), carry_text=False
                )
            )
        ).count(),
        "plus_triples_nodistinct": lambda: output.to_triples(
            output.completed_filter(
                slot_fill.ordered_slot_fill(
                    detect.detect_relations(gen()),
                    carry_text=False,
                    dedup_assignments=True,
                )
            ),
            assume_unique=True,
        ).count(),
    }

    results: dict[str, dict] = {}
    prev = 0.0
    for name, job in prefixes.items():
        job()  # warm
        walls = []
        for _ in range(args.passes):
            t0 = time.time()
            n = job()
            walls.append(round(time.time() - t0, 2))
        w = min(walls)
        results[name] = {
            "wall": w,
            "walls": walls,
            "marginal": round(w - prev, 2),
            "rows": n,
        }
        prev = w
        print(f"{name}: {results[name]}", file=sys.stderr)

    print(json.dumps({"cpus": args.cpus, "replicate": args.replicate,
                      "stages": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
