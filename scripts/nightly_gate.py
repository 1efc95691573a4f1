"""Nightly regression gate: judge the newest ``nightly_bench.jsonl`` row
against the preceding rows — on SAME-ROW Spark/DuckDB ratios, not raw
walls (round 13, VERDICT r11 #1).

Why ratios: BASELINE.md's measured ambient band on this shared VM is
±30% aggregate (worst per-query ~51%), so any raw-wall tolerance tight
enough to catch a real regression also fails on weather — the historical
gate (10%/15%/50% wall tolerances) had never passed on real data. Each
ledger row already times the SAME queries in DuckDB in the same process
(``oracle_duckdb_sec``), and ambient load moves both engines together,
so the per-row ratio cancels most of it. What the ratio alone does NOT
cancel: ambient that hits one engine's working set harder (measured
same-code per-query ratio swings reach 5.8x when a DuckDB wall sits in
its floor) — so a per-query failure requires BOTH signals to move:

  - per query: FAIL iff wall > 2x its reference AND same-row ratio > 2x
    its reference (reference = median over up to the last 3 rows). A
    real plan regression inflates the wall with the oracle unchanged, so
    both trip; ambient inflating both engines trips neither; an
    oracle-side wobble trips only the ratio. Queries without an oracle
    column fall back to the wall-only 2x alarm.
  - aggregate: FAIL iff the comparable-suite ratio
    (oracle_comparable_spark_sec / oracle_total_sec) > 1.25x its
    reference median, or the aggregate wall > 2x (the only absolute
    alarm kept, per the VERDICT).
  - a query present in a reference row but MISSING from the new one is
    a coverage loss -> FAIL.

Validated on the committed ledger (tests/test_round13.py): both
same-code ambient pairs (03:57->20:38 with +39% aggregate wall, and
20:38->23:10) now PASS, and a synthetic single-query 2.2x wall
regression still FAILS.

Usage: python scripts/nightly_gate.py [path-to-jsonl]
Exit 0 = within band (or fewer than 2 rows: nothing to compare yet),
exit 1 = regression, with one line per finding on stdout.
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

WALL_TOL = 2.0       # per-query and aggregate absolute-wall multiplier
RATIO_TOL = 2.0      # per-query same-row ratio multiplier
AGG_RATIO_TOL = 1.25  # aggregate comparable-ratio multiplier
REF_ROWS = 3          # reference = median over up to this many prior rows


def _agg_ratio(bench: dict) -> float | None:
    oracle_total = float(bench.get("oracle_total_sec") or 0.0)
    if oracle_total <= 0:
        return None
    spark = float(bench.get("oracle_comparable_spark_sec", bench["value"]))
    return spark / oracle_total


def _query_ratio(bench: dict, name: str) -> float | None:
    o = bench.get("oracle_duckdb_sec", {}).get(name)
    if not o:
        return None
    return float(bench["queries"][name]) / float(o)


def compare_rows(ref_rows: list[dict], new: dict) -> list[str]:
    """Regression findings for ``new`` against the reference rows (each
    ``{'ts':…,'bench':…}``); empty list = within band."""
    findings: list[str] = []
    nb = new["bench"]
    benches = [r["bench"] for r in ref_rows]

    ref_names = sorted({n for b in benches for n in b.get("queries", {})})
    for name in ref_names:
        walls = [float(b["queries"][name]) for b in benches if name in b.get("queries", {})]
        ratios = [r for b in benches if (r := _query_ratio(b, name)) is not None]
        if name not in nb.get("queries", {}):
            findings.append(f"query {name}: missing from new row (coverage loss)")
            continue
        wall = float(nb["queries"][name])
        ref_wall = statistics.median(walls)
        wall_bad = wall > ref_wall * WALL_TOL
        ratio = _query_ratio(nb, name)
        if ratios and ratio is not None:
            ref_ratio = statistics.median(ratios)
            ratio_bad = ratio > ref_ratio * RATIO_TOL
        else:
            # no oracle on one side: the wall alarm stands alone
            ref_ratio, ratio_bad = None, True
        if wall_bad and ratio_bad:
            detail = f"wall {ref_wall:.3f}s -> {wall:.3f}s (> {WALL_TOL:.0f}x)"
            if ref_ratio is not None and ratio is not None:
                detail += f", same-row ratio {ref_ratio:.2f} -> {ratio:.2f} (> {RATIO_TOL:.0f}x)"
            findings.append(f"query {name}: {detail}")

    agg_refs = [a for b in benches if (a := _agg_ratio(b)) is not None]
    agg_new = _agg_ratio(nb)
    if agg_refs and agg_new is not None:
        ref = statistics.median(agg_refs)
        if agg_new > ref * AGG_RATIO_TOL:
            findings.append(
                f"aggregate comparable ratio: {ref:.3f} -> {agg_new:.3f} "
                f"(> {AGG_RATIO_TOL:.2f}x)"
            )
    wall_refs = [float(b["value"]) for b in benches]
    if float(nb["value"]) > statistics.median(wall_refs) * WALL_TOL:
        findings.append(
            f"aggregate wall: {statistics.median(wall_refs):.2f}s -> "
            f"{float(nb['value']):.2f}s (> {WALL_TOL:.0f}x)"
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
    refs, new = rows[-(REF_ROWS + 1):-1], rows[-1]
    findings = compare_rows(refs, new)
    if findings:
        print(f"nightly gate: REGRESSION {refs[-1]['ts']} -> {new['ts']}")
        for f in findings:
            print("  " + f)
        return 1
    agg = _agg_ratio(new["bench"])
    print(f"nightly gate: within band {refs[-1]['ts']} -> {new['ts']} "
          f"(wall {float(new['bench']['value']):.2f}s, comparable ratio "
          f"{agg if agg is None else round(agg, 3)})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
