"""Materialized rollup pyramid (SURVEY §3.1 step 7, dgv/metrics views).

Reference: 15 Postgres materialized views refreshed in topological order
with REFRESH ... CONCURRENTLY so serving reads never block
(dgv/metrics/sql/create_tables.sql:127-342; task.py:256-283;
utils/postgres.py:45-65).

Spark shape: an ordered CTAS DAG — each level is a DataFrame derived from
already-materialized lower levels, written to scratch and atomically swapped
into the serving path (rename), which reproduces the CONCURRENTLY property:
readers see either the old or the new table, never a partial one.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class RollupPyramid:
    """Ordered set of derived tables: name -> builder(deps) in topological
    order. Builders receive a dict of already-materialized DataFrames."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self._levels: list[tuple[str, Callable[[dict[str, DataFrame]], DataFrame]]] = []

    def add(self, name: str, builder: Callable[[dict[str, DataFrame]], DataFrame]):
        self._levels.append((name, builder))
        return self

    def table_path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def refresh_all(self) -> dict[str, DataFrame]:
        """Materialize every level in order with atomic swap (the
        topological refresh loop, task.py:256-283)."""
        materialized: dict[str, DataFrame] = {}
        for name, builder in self._levels:
            df = builder(materialized)
            final = self.table_path(name)
            tmp = final + "__building"
            df.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
            old = final + "__old"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(final):
                os.rename(final, old)
            os.rename(tmp, final)
            if os.path.exists(old):
                shutil.rmtree(old)
            materialized[name] = self.spark.read.parquet(final)
        return materialized
