"""Targeted per-query timing harness (round 13).

Times a comma-separated list of catalog queries with the bench's
prepared-plan fulleval protocol, printing EVERY sample (not just the
median) so ambient outliers are visible. Usage:

    SPARK_GRAFT_QUERIES=a36_corr_matrix,w19_ohlc_daily \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/qtime.py

Env knobs: SPARK_GRAFT_QTIME_REPS (default 5), SPARK_GRAFT_CPUS,
SPARK_GRAFT_QTIME_ACTION (fulleval|count|noop, default fulleval).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _run(df, action: str) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql.types import MapType

    if action == "fulleval":
        cols = [
            F.to_json(f.name) if isinstance(f.dataType, MapType) else F.col(f.name)
            for f in df.schema.fields
        ]
        df.select(F.bit_xor(F.xxhash64(*cols)).alias("h")).collect()
    elif action == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_QTIME_REPS", "5"))
    action = os.environ.get("SPARK_GRAFT_QTIME_ACTION", "fulleval")
    names = [
        n for n in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if n
    ]

    from datagouvfr_data_pipelines_spark import plans
    from datagouvfr_data_pipelines_spark.session import get_spark

    input_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*") if f.is_file()
    )
    spark = get_spark(
        app_name="qtime", master=f"local[{cpus}]", input_bytes=input_bytes
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            _run(df, action)
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        import statistics

        print(
            f"{name}: median={statistics.median(samples):.3f} samples={samples}",
            file=sys.stderr,
        )
    print(json.dumps({"action": action, "reps": reps, "samples": out,
                      "load_avg_1min": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
