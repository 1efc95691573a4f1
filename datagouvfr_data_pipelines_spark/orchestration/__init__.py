"""Airflow-facing orchestration shim (SURVEY §2.11, kept OUTSIDE the query
core per BASELINE.json: "Spark jobs orchestrated via Airflow operators")."""
