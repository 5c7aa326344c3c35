#!/usr/bin/env python
"""Dump .explain('formatted') for every headline query into plans/r06/.

Usage: python scripts/dump_plans_r06.py before|after

Queries whose construction embeds eager localCheckpoints (the canonical /
kge / LPA families) EXECUTE their upstream stages at plan-build time; the
dumped plan then shows the post-checkpoint physical plan (scans of
materialized RDDs) plus whatever is still lazy — that is the plan the timed
count() actually runs, so it is the honest evidence for this round's
claims.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "kg_triples",
    "kg_triples_canonical",
    "minhash_dedup",
    "simhash",
    "tpch_q1",
    "vocab_topk",
    "cooccur_pairs",
    "kg_infer_canonical",
    "kg_transe",
    "kg_communities",
    "training_pipeline",
    "paragraph_dedup",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from autoextraction_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r06-{tag}", cpus=32)
    qs = entrymod.queries()
    for name in HEADLINE:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
