#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: ≥0.8 throughput scaling
efficiency between N and 4N executors; sandbox stand-in = local[8] vs
local[32] in separate JVMs on the same input).

Runs bench.py --child at each parallelism level (separate processes —
a JVM can't change master), repeats R times, takes the median, and
prints throughput at both levels + efficiency = (T8/T32) / 4 per
query. Appends a markdown row block to BENCH/BASELINE.md when
--write is passed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(cpus: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--child", str(cpus)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    lo, hi = 8, 32
    runs = {lo: [], hi: []}
    for r in range(reps):
        for cpus in (lo, hi):
            res = run_child(cpus)
            runs[cpus].append(res)
            print(f"# rep {r} cpus={cpus}: {res['queries']}", file=sys.stderr)

    report = {"n_cpus": lo, "four_n_cpus": hi, "reps": reps, "queries": {}}
    names = runs[lo][0]["queries"].keys()
    for q in names:
        t_lo = statistics.median(r["queries"][q] for r in runs[lo])
        t_hi = statistics.median(r["queries"][q] for r in runs[hi])
        rows = runs[lo][0]["rows"][q]
        thr_lo = rows / t_lo if t_lo else 0.0
        thr_hi = rows / t_hi if t_hi else 0.0
        eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo else 0.0
        report["queries"][q] = {
            "rows": rows,
            "sec_n": round(t_lo, 3),
            "sec_4n": round(t_hi, 3),
            "rows_per_sec_n": round(thr_lo, 1),
            "rows_per_sec_4n": round(thr_hi, 1),
            "scaling_efficiency": round(eff, 3),
        }
    print(json.dumps(report))

    if "--write" in sys.argv:
        lines = [
            "\n## Measured scaling (local[8] vs local[32], same input, median of "
            f"{reps} reps, MULT={os.environ.get('SPARK_GRAFT_MULT', '100')}, sf0.1)\n",
            "| query | rows | sec @N | sec @4N | rows/s @N | rows/s @4N | efficiency |",
            "|---|---|---|---|---|---|---|",
        ]
        for q, d in report["queries"].items():
            lines.append(
                f"| {q} | {d['rows']} | {d['sec_n']} | {d['sec_4n']} | "
                f"{d['rows_per_sec_n']} | {d['rows_per_sec_4n']} | {d['scaling_efficiency']} |"
            )
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
