#!/usr/bin/env python
"""Extra benchmarks for the r6 optimization round (bench.py is FROZEN —
this file holds the guide §1.4 noop-sink isolation and the family walls the
headline bench does not cover; cite from OPTIMIZATION_r06.md).

Modes (env BENCH_EXTRA_MODE):
  stages  — noop-sink decomposition of the extraction pipeline (skeleton /
            fused python stage / to_triples), the measurement behind the
            r6 pipeline-fusion claims.
  family  — calibration-bracketed walls for the non-headline heavy queries
            (winnow, quote_pairs, knn_graph, dedup_recall_eval, ...).

Both print one JSON line. Run ALONE (the machine's degraded windows are
documented in BENCH/BASELINE.md); the calibration walls are included so a
capture defends itself.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAMILY = [
    "winnow", "quote_pairs", "cdc_chunks", "tfidf_keywords", "knn_graph",
    "dedup_recall_eval", "incremental_dedup", "dedup_best_survivor",
    "kg_rule_mining", "host_profile", "kg_scc", "kg_closure", "bpe_train",
]


def _cal(spark, cpus):
    from pyspark.sql import functions as F, types as T

    t0 = time.time()
    spark.range(1_000_000, numPartitions=cpus).groupBy(
        (F.col("id") % 97).alias("k")
    ).count().count()
    probe = F.pandas_udf(lambda s: s * 2.0, T.DoubleType())
    spark.range(cpus * 5_000, numPartitions=cpus).select(
        probe(F.col("id").cast("double"))
    ).count()
    return round(time.time() - t0, 3)


def _noop(spark, label, df):
    t0 = time.time()
    spark.sparkContext.setJobDescription(label)
    df.write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)
    return round(time.time() - t0, 3)


def main() -> int:
    mode = os.environ.get("BENCH_EXTRA_MODE", "stages")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from autoextraction_spark import corpus
    from autoextraction_spark.operators import output, slot_fill
    from autoextraction_spark.session import get_spark
    from pyspark.sql import functions as F, types as T

    spark = get_spark(app_name=f"bench-extra-{mode}", cpus=cpus)
    warm = F.pandas_udf(lambda s: s * 1.0, T.DoubleType())
    spark.range(cpus * 20000, numPartitions=cpus * 2).select(
        warm(F.col("id").cast("double"))
    ).count()

    out: dict = {"metric": f"bench_extra_{mode}", "sf": sf_dir, "cpus": cpus}
    if mode == "stages":
        walls: dict[str, list[float]] = {}
        cals = []
        for _ in range(3):
            skel = corpus.doc_skeleton(spark, sf_dir)
            walls.setdefault("skeleton", []).append(_noop(spark, "skeleton", skel))
            eps = slot_fill.episodes_from_skeleton(
                corpus.doc_skeleton(spark, sf_dir), dedup_assignments=True
            )
            walls.setdefault("fused_episodes", []).append(
                _noop(spark, "fused episodes", eps)
            )
            trip = output.to_triples(
                output.completed_filter(
                    slot_fill.episodes_from_skeleton(
                        corpus.doc_skeleton(spark, sf_dir), dedup_assignments=True
                    )
                ),
                assume_unique=True,
            )
            walls.setdefault("kg_triples_noop", []).append(
                _noop(spark, "kg_triples", trip)
            )
            cals.append(_cal(spark, cpus))
            gc.collect()
        out["walls"] = walls
        out["calibration"] = cals
        out["value"] = round(min(walls["kg_triples_noop"]), 3)
    else:
        qs = entrymod.queries()
        walls = {}
        cals = [_cal(spark, cpus)]
        for _ in range(3):
            for name in FAMILY:
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                walls.setdefault(name, []).append(round(time.time() - t0, 3))
                gc.collect()
            cals.append(_cal(spark, cpus))
        out["walls"] = walls
        out["queries"] = {n: min(w) for n, w in walls.items()}
        out["calibration"] = cals
        out["value"] = round(sum(out["queries"].values()), 3)
    out["unit"] = "sec"
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
