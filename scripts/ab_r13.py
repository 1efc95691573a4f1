"""Interleaved A/B driver (round 13).

Alternates qtime.py runs between two repo checkouts (A=baseline snapshot,
B=working tree) in separate processes, pooling per-rep samples. The only
trustworthy way to read ±0.1-0.3 s effects on this shared VM (see
OPTIMIZATION_r12.md "Measurement discipline").

Usage:
    python scripts/ab_r13.py A_DIR B_DIR query1,query2 [rounds] [reps]

Each round runs A then B (one process each, `reps` timed reps per query).
The FIRST rep of each process is dropped (JIT/codegen warmup); medians are
over the pooled remaining samples. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_one(repo: str, queries: str, reps: int) -> dict[str, list[float]]:
    env = dict(os.environ)
    env["SPARK_GRAFT_QUERIES"] = queries
    env["SPARK_GRAFT_QTIME_REPS"] = str(reps)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "qtime.py")],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["samples"]


def main() -> None:
    a_dir, b_dir, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    pooled: dict[str, dict[str, list[float]]] = {"A": {}, "B": {}}
    for r in range(rounds):
        for tag, repo in (("A", a_dir), ("B", b_dir)):
            s = run_one(repo, queries, reps)
            for q, xs in s.items():
                pooled[tag].setdefault(q, []).extend(xs[1:])  # drop warmup rep
            print(f"round {r} {tag}: " + json.dumps(s), file=sys.stderr)
    result = {}
    for q in pooled["A"]:
        ma = statistics.median(pooled["A"][q])
        mb = statistics.median(pooled["B"][q])
        result[q] = {
            "A_median": round(ma, 3),
            "B_median": round(mb, 3),
            "delta": round(mb - ma, 3),
            "A_samples": pooled["A"][q],
            "B_samples": pooled["B"][q],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
