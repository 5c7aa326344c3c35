#!/usr/bin/env python
"""Machine-level probe: does the pure-Python scorer workload itself scale
from N to 4N processes on this box — no Spark, no Arrow, no shuffle?

Each worker runs the SAME fixed batch of scorers.batch_step calls (the
dominant compute of the fused episode pass). If 4N processes do NOT deliver
~4x the aggregate throughput of N processes, the ceiling is the machine
(memory bandwidth / SMT / host contention), not the Spark plan — no Spark
tuning can recover it, and a real cluster (per-node bandwidth) would.

    python scripts/py_scaling_probe.py --n 8 --seconds 20
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")


def _worker(seconds: float, out_q) -> None:
    try:
        _worker_inner(seconds, out_q)
    except BaseException as exc:  # parent must never hang on q.get()
        out_q.put(("err", repr(exc)))


def _worker_inner(seconds: float, out_q) -> None:
    from autoextraction_spark import corpus, scorers
    from autoextraction_spark.operators.text_extract import extract_text

    # deterministic batch shaped like one fork wave: 256 states over the
    # synthetic corpus's fact arithmetic
    states = []
    for doc_id in range(256):
        text = extract_text(corpus.build_html(doc_id * 7, "en"))
        states.append((text, "works_for", "en", {}, ["subject", "object"]))
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        scorers.batch_step(states, "rl")
        n += len(states)
    out_q.put(n)


def run_level(procs: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(seconds, q)) for _ in range(procs)
    ]
    t0 = time.time()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    errs = [r for r in results if isinstance(r, tuple)]
    if errs:
        raise RuntimeError(errs[0][1])
    total = sum(results)
    wall = time.time() - t0
    return total / wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    best = {}
    for procs in (args.n, args.n * 4):
        best[procs] = max(
            run_level(procs, args.seconds) for _ in range(args.rounds)
        )
        print(f"{procs} procs: {best[procs]:.0f} states/s", file=sys.stderr)
    speedup = best[args.n * 4] / best[args.n]
    print(
        json.dumps(
            {
                "probe": "pure-python scorers.batch_step, no Spark",
                "n_procs": args.n,
                "states_per_sec_n": round(best[args.n], 1),
                "states_per_sec_4n": round(best[args.n * 4], 1),
                "speedup": round(speedup, 3),
                "efficiency": round(speedup / 4, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
