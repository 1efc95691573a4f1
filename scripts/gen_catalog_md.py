"""Regenerate CATALOG.md from the live query registry.

Usage: python scripts/gen_catalog_md.py   (writes CATALOG.md at repo root)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def first_sentence_line(doc: str | None) -> str:
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    return line.replace("|", "\\|")


def main() -> None:
    from datagouvfr_data_pipelines_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    n = len(CATALOG)
    n_oracle = sum(1 for q in CATALOG.values() if q.oracle)
    rows = []
    for name in sorted(CATALOG):
        q = CATALOG[name]
        check = "oracle" if q.oracle else "rows-only"
        tags = ", ".join(q.tags)
        rows.append(
            f"| `{name}` | {check} | {tags} | {first_sentence_line(q.fn.__doc__)} |"
        )
    if n_oracle == n:
        checks_line = (
            f"{n} queries, ALL {n_oracle} with DuckDB value oracles.\n"
        )
    else:
        checks_line = (
            f"{n} queries, {n_oracle} with DuckDB oracles (the rest are\n"
            "rows-only: iterative algorithms, hash functions DuckDB lacks, or\n"
            "float-basis outputs — each names its unit-test coverage in its "
            "docstring).\n"
        )
    out = (
        "# Query catalog\n\n"
        + checks_line +
        "Every entry is a `(spark_fn, oracle_sql)` pair registered in `plans/*.py`\n"
        "and served through `__spark_entry__.py`.\n"
        "Regenerate with `python scripts/gen_catalog_md.py`.\n\n"
        "| query | check | tags | summary |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    (REPO_ROOT / "CATALOG.md").write_text(out)
    print(f"wrote CATALOG.md: {n} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
