"""Nightly regression gate: judge the newest ``nightly_bench.jsonl`` row
against the previous one, within BASELINE.md's measured ambient noise band.

Rules (a REGRESSION is slower-only; getting faster never fails):
  - aggregate headline value          > 10% slower -> fail
  - any multi-second query (>= 1 s)   > 15% slower -> fail
  - any sub-second query              > 50% slower -> fail (scan-floor
    class, BASELINE.md documents ~±30% ambient variance on a shared VM)
  - a query present in the previous row but MISSING from the new one is
    a coverage loss -> fail

Usage: python scripts/nightly_gate.py [path-to-jsonl]
Exit 0 = within band (or fewer than 2 rows: nothing to compare yet),
exit 1 = regression, with one line per finding on stdout.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

AGG_TOL = 0.10
MULTISEC_TOL = 0.15
SUBSEC_TOL = 0.50


def compare_rows(prev: dict, new: dict) -> list[str]:
    """Regression findings between two nightly rows ({'ts':…,'bench':…});
    empty list = within band."""
    findings: list[str] = []
    pb, nb = prev["bench"], new["bench"]
    pv, nv = float(pb["value"]), float(nb["value"])
    if nv > pv * (1.0 + AGG_TOL):
        findings.append(
            f"aggregate {pb.get('metric', 'value')}: {pv:.2f}s -> {nv:.2f}s "
            f"(+{(nv / pv - 1) * 100:.0f}% > {AGG_TOL * 100:.0f}%)"
        )
    pq, nq = pb.get("queries", {}), nb.get("queries", {})
    for name in sorted(pq):
        if name not in nq:
            findings.append(f"query {name}: missing from new row (coverage loss)")
            continue
        p, n = float(pq[name]), float(nq[name])
        tol = MULTISEC_TOL if p >= 1.0 else SUBSEC_TOL
        if n > p * (1.0 + tol):
            findings.append(
                f"query {name}: {p:.3f}s -> {n:.3f}s "
                f"(+{(n / p - 1) * 100:.0f}% > {tol * 100:.0f}%)"
            )
    return findings


def main(argv: list[str]) -> int:
    path = Path(argv[1]) if len(argv) > 1 else (
        Path(__file__).resolve().parent / "nightly_bench.jsonl"
    )
    rows = [
        json.loads(line)
        for line in path.read_text().splitlines()
        if line.strip()
    ]
    if len(rows) < 2:
        print(f"nightly gate: {len(rows)} row(s) in {path.name}, "
              "nothing to compare yet — pass")
        return 0
    prev, new = rows[-2], rows[-1]
    findings = compare_rows(prev, new)
    if findings:
        print(f"nightly gate: REGRESSION {prev['ts']} -> {new['ts']}")
        for f in findings:
            print("  " + f)
        return 1
    print(f"nightly gate: within band {prev['ts']} -> {new['ts']} "
          f"({float(prev['bench']['value']):.2f}s -> "
          f"{float(new['bench']['value']):.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
