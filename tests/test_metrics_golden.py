"""Golden-file e2e for the faithful HAProxy metrics port — byte-level parity
with the reference's own fixtures (dgv/metrics/test/: test_raw.log +
*_found_expected.csv + *_catalog.csv + *_expected.csv) across ALL FIVE
object types (resources, datasets, organizations, reuses, dataservices),
mirroring the reference's task_functions_test.py parse and aggregate tests.
"""

from __future__ import annotations

import csv
import io
import os

import pandas as pd
import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.pipelines.metrics import (
    DATAGOUV_LOG_TYPES,
    aggregate_object_metrics,
    extract_hits_typed,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "metrics")
DATE = "1900-01-01"


def _fixture(name: str) -> bytes:
    with open(os.path.join(FIXDIR, name), "rb") as fh:
        return fh.read()


def test_extract_log_info_single_line(spark):
    """The reference's extract_log_info unit case (task_functions_test.py):
    an absolute-URL api permalink resolves to (id, resources, api_permalink)."""
    line = (
        "2025-08-01T03:22:51.022900+02:00 slb-04 haproxy[345597]: X.X.X.X:0000"
        " [01/Aug/2025:03:22:50.974] DATAGOUVFR_RGS~ DATAGOUVFR_NEWINFRA/dataweb-06"
        ' 0/0/4/44/+48 302 +792 - - --NN 442/362/8/1/0 0/0 "GET'
        ' https://www.data.gouv.fr/api/1/datasets/r/5ffa8553-0e8f-4622-add9-5c0b593ca1f8 HTTP/2.0"'
    )
    got = extract_hits_typed(
        spark.createDataFrame([(line,)], "value string"), DATE
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.object_type, r.id, r.segment) == (
        "resources",
        "5ffa8553-0e8f-4622-add9-5c0b593ca1f8",
        "api_permalink",
    )


def test_parse_logs_golden_all_types(spark):
    """parse stage: the found CSV for every object type must byte-match the
    reference fixture (same rows, same log order, same ;-CSV encoding)."""
    path = os.path.join(FIXDIR, "test_raw.log")
    # line numbers for the golden export: zipWithIndex preserves text-file
    # order (order is only needed to serialize the golden CSV — the
    # aggregate stage is order-free)
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    raw = rdd.toDF(["value", "line_no"])
    hits = extract_hits_typed(raw, DATE)
    rows = hits.orderBy("line_no").collect()

    for obj_type in DATAGOUV_LOG_TYPES:
        buf = io.StringIO()
        writer = csv.DictWriter(
            buf, ["id", "date_metric", "segment"], delimiter=";"
        )
        writer.writeheader()
        for r in rows:
            if r.object_type == obj_type:
                writer.writerow(
                    {"id": r.id, "date_metric": r.date_metric, "segment": r.segment}
                )
        assert buf.getvalue().encode() == _fixture(
            f"test_{obj_type}_found_expected.csv"
        ), f"parse mismatch for {obj_type}"


def _spark_df_from_csv(spark, name: str, sep: str, usecols=None):
    pdf = pd.read_csv(
        os.path.join(FIXDIR, name), dtype="string", sep=sep, usecols=usecols
    )
    pdf = pdf.astype(object).where(pd.notna(pdf), None)
    return spark.createDataFrame(pdf)


def test_aggregate_metrics_golden_all_types(spark):
    """aggregate stage: counts + catalog join + output column order must
    byte-match the reference's to_csv output for every object type."""
    for obj_type, spec in DATAGOUV_LOG_TYPES.items():
        found = _spark_df_from_csv(
            spark, f"test_{obj_type}_found_expected.csv", sep=";"
        )
        catalog = _spark_df_from_csv(
            spark,
            f"test_{obj_type}_catalog.csv",
            sep=";",
            usecols=list(spec["catalog_columns"].keys()),
        )
        out = aggregate_object_metrics(found, catalog, obj_type)
        got = out.toPandas().to_csv(index=False, header=True, sep=",")
        assert got.encode() == _fixture(
            f"test_{obj_type}_expected.csv"
        ), f"aggregate mismatch for {obj_type}"


def test_parse_then_aggregate_end_to_end(spark):
    """Full pipeline from raw log to final metrics without touching the
    intermediate fixture: parse -> aggregate must equal the expected CSVs."""
    raw = spark.read.text(os.path.join(FIXDIR, "test_raw.log"))
    hits = extract_hits_typed(raw, DATE).cache()
    try:
        for obj_type, spec in DATAGOUV_LOG_TYPES.items():
            catalog = _spark_df_from_csv(
                spark,
                f"test_{obj_type}_catalog.csv",
                sep=";",
                usecols=list(spec["catalog_columns"].keys()),
            )
            found = hits.where(F.col("object_type") == obj_type).select(
                "id", "date_metric", "segment"
            )
            out = aggregate_object_metrics(found, catalog, obj_type)
            got = out.toPandas().to_csv(index=False, header=True, sep=",")
            assert got.encode() == _fixture(
                f"test_{obj_type}_expected.csv"
            ), f"e2e mismatch for {obj_type}"
    finally:
        hits.unpersist()


def test_extract_stage_compiles(spark):
    """Pin the codegen shape of the hottest 100 TB scan: the staged
    two-projection extract chain (pipelines/metrics.py:extract_hits_typed)
    must stay inside whole-stage codegen with ``spark.sql.codegen.fallback``
    DISABLED — so a janino 64KB-method rejection fails the test loudly
    instead of silently dropping the stage to interpreted row evaluation.

    Exercises BOTH entry shapes: the raw text-file path (golden log) and
    the m5_weblog_hits synthesized-value path (whose ``value`` is a
    concat/CASE expression — the shape that produced a 1.5 MB generated
    method when the ``spark_partition_id() >= 0`` nondeterministic guard
    was absent and Catalyst pushed ``isnotnull(CASE ...)`` through every
    projection into the scan). Removing the guard or fusing the staged
    projections regenerates the oversized method and this test fails
    with a codegen CompileException.
    """
    from datagouvfr_data_pipelines_spark.plans.relational17 import (
        m5_weblog_hits,
    )

    sf_smoke = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        # raw text path: golden log through the full extract chain
        raw = spark.read.text(os.path.join(FIXDIR, "test_raw.log"))
        hits = extract_hits_typed(raw, DATE)
        # "*(n)" prefixes mark WholeStageCodegen spans in the plan string;
        # every Project/Filter of the extract chain must carry one
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "*(1) Project" in plan and "*(1) Filter" in plan, plan
        n_raw = hits.count()
        assert n_raw > 0

        # synthesized-value path: the m5 plan end to end at sf0.001
        # (execute first — AQE only materializes codegen spans in the
        # final plan; with fallback disabled the collect itself is the
        # compile gate)
        m5 = m5_weblog_hits(spark, sf_smoke)
        rows = m5.collect()
        assert len(rows) > 0
        m5_plan = m5._jdf.queryExecution().executedPlan().toString()
        assert "*(" in m5_plan and "isFinalPlan=true" in m5_plan, m5_plan
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
