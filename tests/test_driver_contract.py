"""Driver-environment contract: every catalog query must ANALYZE under a
vanilla SparkSession with no engine conf — the driver builds queries with
its own session, so anything that only resolves under session.get_spark()
settings is a bug (this is exactly how the TIMESTAMP_NTZ unix_micros break
slipped past a green engine-session test suite in round 2).

Analysis (.schema) is cheap — no execution — so this covers the full
catalog in seconds.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def plain_spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("driver-contract")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def test_every_catalog_query_analyzes_on_plain_session(plain_spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    failures = {}
    for name, fn in plans.queries().items():
        try:
            fn(plain_spark, sf_dir).schema  # forces full analysis
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:200]
    assert failures == {}


def test_tables_read_ntz_free_on_plain_session(plain_spark, sf_dir):
    """table() must never surface TIMESTAMP_NTZ — the engine's function
    surface (unix_micros, window, to_utc_timestamp) requires TIMESTAMP."""
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    for name in ("events", "orders", "lineitem"):
        df = table(plain_spark, sf_dir, name)
        ntz = [f for f, t in df.dtypes if t == "timestamp_ntz"]
        assert ntz == [], (name, ntz)


def test_catalog_md_is_current():
    """The committed CATALOG.md must track the live registry — both the
    self-correcting header count and one table row per query. Fails on a
    stale file; fix with `python scripts/gen_catalog_md.py`."""
    import re
    from pathlib import Path

    from datagouvfr_data_pipelines_spark import plans

    n_live = len(plans.queries())
    text = Path(__file__).resolve().parent.parent.joinpath("CATALOG.md").read_text()
    header = re.search(r"^(\d+) queries", text, re.M)
    assert header is not None, "CATALOG.md header missing query count"
    assert int(header.group(1)) == n_live, (
        f"CATALOG.md header says {header.group(1)} queries, registry has "
        f"{n_live} — regenerate with scripts/gen_catalog_md.py"
    )
    n_rows = len(re.findall(r"^\| `", text, re.M))
    assert n_rows == n_live, (
        f"CATALOG.md has {n_rows} table rows, registry has {n_live} — "
        "regenerate with scripts/gen_catalog_md.py"
    )
