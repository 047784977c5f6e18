#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: ≥0.8 throughput scaling
efficiency between N and 4N executors).

Sandbox protocol: N = local-cluster[1,2,·] (one 2-core executor JVM),
4N = local-cluster[4,2,·] (four executor JVMs) — real separate
executor processes, and the 2→8-core range is where this host's CPU
is measured hardware-linear (4.04× at 4× workers; 8→32 vCPUs only
deliver 2.5× because 32 vCPUs share ~16 physical cores, capping ANY
engine at 0.63 there — measured with a pure-python burn and recorded
in BASELINE.md).

Runs bench.py --child at each level (separate processes), repeats R
times, takes the median, prints throughput at both + efficiency =
(throughput_4N / throughput_N) / 4. --write appends to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_EXEC = os.environ.get("SPARK_GRAFT_SCALING_N", "1x2x12288")
FOURN_EXEC = os.environ.get("SPARK_GRAFT_SCALING_4N", "4x2x12288")


def run_child(executors: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_EXECUTORS"] = executors
    cores = int(executors.split("x")[0]) * int(executors.split("x")[1])
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--child", str(cores)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    lo, hi = N_EXEC, FOURN_EXEC
    runs = {lo: [], hi: []}
    for r in range(reps):
        for execs in (lo, hi):
            res = run_child(execs)
            runs[execs].append(res)
            print(f"# rep {r} executors={execs}: {res['queries']}", file=sys.stderr)

    report = {"n_executors": lo, "four_n_executors": hi, "reps": reps, "queries": {}}
    names = runs[lo][0]["queries"].keys()
    for q in names:
        t_lo = statistics.median(r["queries"][q] for r in runs[lo])
        t_hi = statistics.median(r["queries"][q] for r in runs[hi])
        rows = runs[lo][0]["rows"][q]
        thr_lo = rows / t_lo if t_lo else 0.0
        thr_hi = rows / t_hi if t_hi else 0.0
        eff = (thr_hi / thr_lo) / 4.0 if thr_lo else 0.0
        per_rep = [
            {
                "sec_n": a["queries"][q],
                "sec_4n": b["queries"][q],
                "efficiency": round(a["queries"][q] / b["queries"][q] / 4.0, 3),
            }
            for a, b in zip(runs[lo], runs[hi])
        ]
        report["queries"][q] = {
            "rows": rows,
            "sec_n": round(t_lo, 3),
            "sec_4n": round(t_hi, 3),
            "rows_per_sec_n": round(thr_lo, 1),
            "rows_per_sec_4n": round(thr_hi, 1),
            "scaling_efficiency": round(eff, 3),
            "per_rep": per_rep,
            "median_per_rep_efficiency": round(
                statistics.median(p["efficiency"] for p in per_rep), 3
            ),
        }
    print(json.dumps(report))

    if "--write" in sys.argv:
        lines = [
            f"\n## Measured scaling (N = local-cluster[{lo}] vs 4N = local-cluster[{hi}], "
            f"same input, median of {reps} reps, "
            f"MULT={os.environ.get('SPARK_GRAFT_MULT', '100')}, sf0.1)\n",
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
