"""Row-group twin bench: is the sub-second >2x tail a layout artifact?

BASELINE.md argues the five scan-floor headliners (q1_pricing_summary,
j1_brand_revenue, q21_waiting_supplier, a36_corr_matrix,
j18_brand_affinity) run 6-12x DuckDB at sf0.1 ONLY because the driver's
parquet files carry a single row group (lineitem: 600k rows / 1 group), so
Spark cannot split the scan and one task feeds 32 cores — a layout no real
deployment ships (writers emit 64-128 MiB groups; a 100 TB table carries
~10^6 splittable units). This script records the evidence: rewrite sf0.1
with 64k-row groups (pyarrow round-trip, schema byte-identical), re-time
the five queries under the exact bench.py fulleval protocol on BOTH
layouts (Spark and the DuckDB oracle), and emit
scripts/bench_rowgroups_r9.json with the per-layout ratios.

Run: python scripts/bench_rowgroups.py  (~2 min; writes the JSON artifact)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

QUERIES = [
    "q1_pricing_summary",
    "j1_brand_revenue",
    "q21_waiting_supplier",
    "a36_corr_matrix",
    "j18_brand_affinity",
]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
ROW_GROUP_SIZE = 65_536
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))


def rewrite_rowgroups(src_dir: str, dst_dir: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    groups = {}
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        table = pq.ParquetFile(src).read()
        pq.write_table(table, dst, row_group_size=ROW_GROUP_SIZE,
                       compression="zstd")
        groups[t] = pq.ParquetFile(dst).metadata.num_row_groups
    return groups


def time_spark(spark, qs, name: str, sf_dir: str) -> float:
    from bench import _run

    samples = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        _run(df, "fulleval")
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def time_duckdb(sf_dir: str, oracles) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for name in QUERIES:
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
    con.close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    twin_dir = tempfile.mkdtemp(prefix="sf01_rg64k_")
    try:
        groups = rewrite_rowgroups(sf_dir, twin_dir)

        from datagouvfr_data_pipelines_spark import plans
        from datagouvfr_data_pipelines_spark.session import get_spark

        input_bytes = sum(
            f.stat().st_size for f in Path(sf_dir).rglob("*") if f.is_file()
        )
        spark = get_spark(
            app_name="bench_rowgroups",
            master=f"local[{cpus}]",
            input_bytes=input_bytes,
        )
        spark.sparkContext.setLogLevel("ERROR")
        qs = plans.queries()
        oracles = plans.oracle_sql()

        # warm up JVM once, then interleave layouts per query so JIT warmth
        # is shared rather than favoring whichever layout runs second
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        spark_orig, spark_twin = {}, {}
        for name in QUERIES:
            spark_orig[name] = time_spark(spark, qs, name, sf_dir)
            spark_twin[name] = time_spark(spark, qs, name, twin_dir)
        duck_orig = time_duckdb(sf_dir, oracles)
        duck_twin = time_duckdb(twin_dir, oracles)

        result = {
            "protocol": {
                "action": "fulleval", "reps": REPS, "stat": "median",
                "cpus": int(cpus), "row_group_size": ROW_GROUP_SIZE,
                "row_groups_per_table": groups,
                "load_avg": round(os.getloadavg()[0], 2),
            },
            "queries": {
                name: {
                    "spark_1rg_sec": spark_orig[name],
                    "spark_64k_sec": spark_twin[name],
                    "duckdb_1rg_sec": duck_orig[name],
                    "duckdb_64k_sec": duck_twin[name],
                    "ratio_1rg": round(spark_orig[name] / duck_orig[name], 2),
                    "ratio_64k": round(spark_twin[name] / duck_twin[name], 2),
                    "spark_speedup": round(
                        spark_orig[name] / spark_twin[name], 2
                    ),
                }
                for name in QUERIES
            },
        }
        out = os.path.join(REPO_ROOT, "scripts", "bench_rowgroups_r9.json")
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(result))
    finally:
        shutil.rmtree(twin_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
