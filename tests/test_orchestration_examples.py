"""Reference-equivalent DAG wirings end-to-end."""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.orchestration.examples import (
    build_consolidation_dag,
    build_metrics_dag,
)
from datagouvfr_data_pipelines_spark.pipelines.consolidation import SchemaVersion


def test_metrics_dag_end_to_end(spark, tmp_path):
    log = tmp_path / "access.log"
    log.write_text(
        '2024-01-01T10:00:00 1.1.1.1 "GET /datasets/budget/" 200 fr\n'
        '2024-02-03T10:00:00 1.1.1.1 "GET /datasets/budget/" 200 en\n'
    )
    catalog_path = str(tmp_path / "catalog")
    spark.createDataFrame(
        [("budget", "d-1", False, "2024-01-01")],
        "slug string, object_id string, archived boolean, created_at string",
    ).write.parquet(catalog_path)
    sink = str(tmp_path / "visits")

    dag = build_metrics_dag(spark, str(log), catalog_path, sink)
    results = dag.run()
    assert results["__skipped__"] == []
    views = results["refresh_materialized_views"]
    monthly = {
        (r["month"], r["slug"]): r["nb_visit"]
        for r in views["visits_monthly"].collect()
    }
    assert monthly == {("2024-01", "budget"): 1, ("2024-02", "budget"): 1}


def test_metrics_dag_short_circuit(spark, tmp_path):
    dag = build_metrics_dag(
        spark, str(tmp_path / "missing.log"), "unused", "unused"
    )
    results = dag.run()
    # the gate failed: everything downstream skipped, nothing touched disk
    assert set(results["__skipped__"]) == {
        "get_new_logs", "download_catalog", "process_and_load",
        "refresh_materialized_views",
    }


def test_consolidation_dag(spark, tmp_path):
    schema = SchemaVersion(
        columns=["id", "v"], types={"v": "double"}, required=["id"],
        primary_key=["id"], min_files=2,
    )
    f1 = spark.createDataFrame([("a", "1")], "id string, v string")
    f2 = spark.createDataFrame([("a", "2"), ("b", "3")], "id string, v string")
    out_path = str(tmp_path / "consolidated")
    dag = build_consolidation_dag(
        spark,
        [(f1, "r1", "2024-01-01"), (f2, "r2", "2024-06-01")],
        schema,
        out_path,
    )
    results = dag.run()
    assert results["publish"] == 2
    rows = {r["id"]: r["v"] for r in spark.read.parquet(out_path).collect()}
    assert rows == {"a": 2.0, "b": 3.0}  # most recent file won key 'a'
