"""Scale sweep: is the >2x sub-second tail a CONSTANT stage floor?

scripts/bench_rowgroups_r9.json settled one half of the question: on a
splittable 64k-row-group layout Spark's wall halves (one task no longer
feeds 32 cores) — but DuckDB speeds up just as much, so the RATIO at
sf0.1 does not collapse. The remaining hypothesis is that Spark's
per-query cost is `floor + marginal x rows` with a large floor (~0.2 s:
job scheduling, task launch, columnar->row, collect) and a competitive
marginal cost, while DuckDB's floor is ~10 ms. If that is true, the
ratio must collapse as the data grows at FIXED query shape; if it is
false (Spark's marginal per-row cost is also 10x), the ratio stays flat
and the bench tail is a real engine deficit.

Method: duplicate the two fact tables (lineitem, orders) k in {1,3,10}
times with the order keys offset by copy_index * 2^32 — per-order
basket sizes, join fan-outs, and exists/not-exists cardinalities stay
exactly realistic (a plain row duplication would inflate j18's
within-order pair expansion quadratically). Dimensions stay single-copy,
as they do at real scale. Both layouts use 64k row groups. Re-time the
five scan-floor headliners under the bench.py fulleval protocol on both
engines and emit scripts/bench_scalefloor_r9.json.

Run: python scripts/bench_scalefloor.py   (~5 min; writes the artifact)
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
FACTS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
SCALES = [
    int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALES", "1,3,10,30"
    ).split(",")
]
ROW_GROUP_SIZE = 65_536
KEY_STRIDE = 1 << 32
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))


def build_scaled(src_dir: str, dst_dir: str, k: int) -> dict[str, int]:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    rows = {}
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        table = pq.ParquetFile(src).read()
        if t in FACTS and k > 1:
            key = FACTS[t]
            copies = []
            for i in range(k):
                if i == 0:
                    copies.append(table)
                    continue
                off = pc.add(
                    pc.cast(table[key], pa.int64()), pa.scalar(i * KEY_STRIDE)
                )
                copies.append(table.set_column(
                    table.schema.get_field_index(key),
                    pa.field(key, pa.int64()), off,
                ))
            # align the key dtype of copy 0 with the offset copies
            copies[0] = copies[0].set_column(
                copies[0].schema.get_field_index(key),
                pa.field(key, pa.int64()),
                pc.cast(copies[0][key], pa.int64()),
            )
            table = pa.concat_tables(copies)
        pq.write_table(table, dst, row_group_size=ROW_GROUP_SIZE,
                       compression="zstd")
        rows[t] = table.num_rows
    return rows


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

    from datagouvfr_data_pipelines_spark import plans
    from datagouvfr_data_pipelines_spark.session import get_spark

    input_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*") if f.is_file()
    )
    qs = plans.queries()
    oracles = plans.oracle_sql()

    points = []
    for k in SCALES:
        # fresh session per scale point, sized for THAT point's input —
        # the same shuffle-partition tuning bench.py applies at its own
        # scale, so the 1x point is not penalized by a 30x-sized config
        spark = get_spark(
            app_name=f"bench_scalefloor_x{k}",
            master=f"local[{cpus}]",
            input_bytes=input_bytes * k,
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        scaled = tempfile.mkdtemp(prefix=f"sfx{k}_")
        try:
            rows = build_scaled(sf_dir, scaled, k)
            spark_t = {n: time_spark(spark, qs, n, scaled) for n in QUERIES}
            duck_t = time_duckdb(scaled, oracles)
            points.append({
                "scale_x": k,
                "lineitem_rows": rows["lineitem"],
                "spark_sec": spark_t,
                "duckdb_sec": duck_t,
                "ratio": {
                    n: round(spark_t[n] / duck_t[n], 2) for n in QUERIES
                },
            })
            print(json.dumps(points[-1]))
        finally:
            shutil.rmtree(scaled, ignore_errors=True)
            spark.stop()

    result = {
        "protocol": {
            "action": "fulleval", "reps": REPS, "stat": "median",
            "cpus": int(cpus), "row_group_size": ROW_GROUP_SIZE,
            "base_sf_dir": sf_dir, "fact_key_stride": KEY_STRIDE,
            "load_avg": round(os.getloadavg()[0], 2),
        },
        "points": points,
    }
    out = os.path.join(REPO_ROOT, "scripts", "bench_scalefloor_r9.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"wrote": out}))


if __name__ == "__main__":
    main()
