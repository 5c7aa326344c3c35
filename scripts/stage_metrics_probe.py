#!/usr/bin/env python
"""Task-level telemetry for the scaling job: where does the non-scaling wall go?

Runs the stages A-D job once (after a warm-up) at one parallelism level with
the Spark UI enabled, then dumps per-stage task aggregates from the REST
status API:

  - wall: job wall-clock
  - task_sum/cores: perfectly-packed lower bound for the stage
  - gap = wall - task_sum/cores: scheduling gaps + stragglers + driver time
  - task max vs median: straggler skew
  - executorRunTime vs executorCpuTime vs jvmGcTime: JVM-side split (python
    UDF wait shows up as runTime with low cpuTime)

Compare two runs (e.g. --cpus 4 vs --cpus 16): a cost that sits in task_sum
at both levels but does NOT shrink 4x is per-task compute inflation
(memory-bandwidth / allocator contention); a cost that sits in `gap` is
scheduling / straggler / driver serial time.

    python scripts/stage_metrics_probe.py --cpus 4  --replicate 1024
    python scripts/stage_metrics_probe.py --cpus 16 --replicate 1024
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=1024)
    args = ap.parse_args()

    from autoextraction_spark import corpus
    from autoextraction_spark.operators import detect, output, slot_fill
    from autoextraction_spark.session import get_spark

    spark = get_spark(
        app_name=f"metrics-{args.cpus}",
        cpus=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext

    def job(replicate: int) -> int:
        txt = corpus.web_pages(
            spark, args.sf_dir, replicate=replicate, with_text=True,
            emit_html=False,
        )
        det = detect.detect_relations(txt)
        completed = slot_fill.ordered_slot_fill(
            det, carry_text=False, dedup_assignments=True
        )
        return output.to_triples(
            output.completed_filter(completed), assume_unique=True
        ).count()

    job(min(args.replicate, 64))  # warm the worker pool + JIT

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    jobs_before = {j["jobId"] for j in rest(base, "/jobs")}

    t0 = time.time()
    n = job(args.replicate)
    wall = time.time() - t0

    stages_out = []
    for j in rest(base, "/jobs"):
        if j["jobId"] in jobs_before:
            continue
        for sid in j["stageIds"]:
            for st in rest(base, f"/stages/{sid}"):
                if st["status"] not in ("COMPLETE", "FAILED"):
                    continue
                q = rest(
                    base,
                    f"/stages/{sid}/{st['attemptId']}/taskSummary"
                    "?quantiles=0.0,0.5,0.95,1.0",
                )
                run_s = st["executorRunTime"] / 1000.0
                stages_out.append(
                    {
                        "stage": sid,
                        "name": st["name"].split("\n")[0][:60],
                        "tasks": st["numCompleteTasks"],
                        "run_sum_s": round(run_s, 1),
                        "run_per_core_s": round(run_s / args.cpus, 1),
                        "cpu_sum_s": round(st["executorCpuTime"] / 1e9, 1),
                        "gc_sum_s": round(st["jvmGcTime"] / 1000.0, 1),
                        "deser_sum_s": round(
                            st["executorDeserializeTime"] / 1000.0, 1
                        ),
                        "task_dur_med_s": round(q["duration"][1] / 1000.0, 2),
                        "task_dur_p95_s": round(q["duration"][2] / 1000.0, 2),
                        "task_dur_max_s": round(q["duration"][3] / 1000.0, 2),
                        "sched_delay_med_ms": round(q["schedulerDelay"][1], 1),
                        "result_ser_med_ms": round(
                            q["resultSerializationTime"][1], 1
                        ),
                    }
                )
    total_run = sum(s["run_sum_s"] for s in stages_out)
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "replicate": args.replicate,
                "triples": n,
                "wall_s": round(wall, 2),
                "task_run_sum_s": round(total_run, 1),
                "packed_lower_bound_s": round(total_run / args.cpus, 1),
                "gap_s": round(wall - total_run / args.cpus, 1),
                "stages": stages_out,
            },
            indent=1,
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
