"""Dump .explain('formatted') for a list of catalog queries (round 13)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r13"))
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    names = [n for n in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if n]

    from datagouvfr_data_pipelines_spark import plans
    from datagouvfr_data_pipelines_spark.session import get_spark

    input_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*") if f.is_file()
    )
    spark = get_spark(
        app_name="plans_r13",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        input_bytes=input_bytes,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.queries()
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(txt)
        ex = txt.count("Exchange")
        print(f"{name}: Exchange={ex} -> {p}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
