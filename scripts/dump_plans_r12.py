"""Dump .explain('formatted') for headline queries to plans/r12/.

Usage: python scripts/dump_plans_r12.py before|after [query ...]
Writes plans/r12/<query>_<tag>.txt for each query (default: the full
bench HEADLINE list). Plan capture only — nothing is executed beyond
what query construction itself runs (e.g. k-means fit collects).
"""
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

tag = sys.argv[1]
names = sys.argv[2:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from datagouvfr_data_pipelines_spark.session import get_spark
from datagouvfr_data_pipelines_spark.plans import queries

input_bytes = sum(f.stat().st_size for f in Path(SF).rglob("*") if f.is_file())
spark = get_spark(app_name="plans-r12", master="local[8]", input_bytes=input_bytes)
spark.sparkContext.setLogLevel("ERROR")

if not names:
    import bench

    names = bench.HEADLINE

qs = queries()
out_dir = REPO / "plans" / "r12"
out_dir.mkdir(parents=True, exist_ok=True)
for name in names:
    try:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print("wrote", name)
    except Exception as e:  # noqa: BLE001
        print("FAILED", name, e, file=sys.stderr)
spark.stop()
