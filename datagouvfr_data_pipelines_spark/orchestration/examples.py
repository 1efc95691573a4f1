"""Reference-equivalent DAG definitions (SURVEY §2.11 / §3.1 plan layer).

Each builder returns a JobDag wiring engine jobs the way the reference's
Airflow DAGs wire task functions. In production every job body is one
``spark-submit`` inside an Airflow operator; the wiring below IS the DAG
shape — short-circuit gating, fan-out, fan-in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from datagouvfr_data_pipelines_spark.orchestration.dag import Job, JobDag


def build_metrics_dag(
    spark: SparkSession,
    log_path: str,
    catalog_path: str,
    sink_path: str,
    has_new_logs=None,
) -> JobDag:
    """dgv_metrics (dgv/metrics/dag.py): ShortCircuit on log arrival ->
    parse+aggregate+load (one Spark job) -> rollup pyramid refresh.

    ``has_new_logs`` mirrors the get_new_logs gate (task.py:59-72):
    when it returns False the whole downstream chain is skipped.
    """
    import os

    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.pipelines.metrics import run_metrics_job
    from datagouvfr_data_pipelines_spark.pipelines.rollup import RollupPyramid

    def default_gate(_results):
        return os.path.exists(log_path)

    def load_catalog(_results):
        return spark.read.parquet(catalog_path)

    def metrics_job(results):
        return run_metrics_job(
            spark, log_path, results["download_catalog"], sink_path
        )

    def refresh_views(_results):
        daily = spark.read.parquet(sink_path)
        pyr = (
            RollupPyramid(spark, sink_path + "_views")
            .add("visits_daily", lambda deps: daily)
            .add(
                "visits_monthly",
                lambda deps: deps["visits_daily"]
                .groupBy(
                    F.substring(F.col("date_metric").cast("string"), 1, 7).alias("month"),
                    "slug",
                )
                .agg(F.sum("nb_visit").alias("nb_visit")),
            )
        )
        return pyr.refresh_all()

    return (
        JobDag()
        .add(Job("get_new_logs", lambda r: True, short_circuit=has_new_logs or default_gate))
        .add(Job("download_catalog", load_catalog, deps=["get_new_logs"]))
        .add(Job("process_and_load", metrics_job, deps=["download_catalog"]))
        .add(Job("refresh_materialized_views", refresh_views, deps=["process_and_load"]))
    )


def build_consolidation_dag(
    spark: SparkSession, files: list, schema, out_path: str
) -> JobDag:
    """schema_consolidation (schema/consolidation/dag.py): conform each
    file (fan-out), consolidate (fan-in), publish."""
    from datagouvfr_data_pipelines_spark.pipelines.consolidation import (
        conform_file,
        consolidate,
    )

    dag = JobDag()
    conform_names = []
    for i, (df, resource_id, last_modified) in enumerate(files):
        name = f"conform_{i}"
        conform_names.append(name)
        dag.add(
            Job(
                name,
                lambda r, df=df, rid=resource_id, lm=last_modified: conform_file(
                    df, schema, rid, lm
                ),
            )
        )

    def consolidate_job(results):
        return consolidate([results[n] for n in conform_names], schema)

    def publish(results):
        out = results["consolidate"]
        if out is None:
            return 0
        out.write.mode("overwrite").parquet(out_path)
        return out.count()

    dag.add(Job("consolidate", consolidate_job, deps=conform_names))
    dag.add(Job("publish", publish, deps=["consolidate"]))
    return dag
