"""Materialized rollup pyramid (SURVEY §3.1 step 7, dgv/metrics views).

Reference: 15 Postgres materialized views refreshed in topological order
with REFRESH ... CONCURRENTLY so serving reads never block
(dgv/metrics/sql/create_tables.sql:127-342; task.py:256-283;
utils/postgres.py:45-65).

Spark shape: an ordered CTAS DAG with GENERATIONED tables. Each refresh
writes ``<table>/gen=<n>/`` and atomically flips a ``_CURRENT`` pointer;
previous generations are retained for ``keep_generations`` refreshes. This
reproduces the full CONCURRENTLY property: a reader that opened generation
n keeps a consistent snapshot even while (and after) generation n+1 is
published — a plain rename-swap breaks in-flight readers because their
resolved file lists vanish.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class RollupPyramid:
    """Ordered set of derived tables: name -> builder(deps) in topological
    order. Builders receive a dict of already-materialized DataFrames."""

    def __init__(self, spark: SparkSession, base_dir: str, keep_generations: int = 2):
        self.spark = spark
        self.base_dir = base_dir
        self.keep_generations = max(1, keep_generations)
        self._levels: list[tuple[str, Callable[[dict[str, DataFrame]], DataFrame]]] = []

    def add(self, name: str, builder: Callable[[dict[str, DataFrame]], DataFrame]):
        self._levels.append((name, builder))
        return self

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def current_generation(self, name: str) -> int | None:
        ptr = os.path.join(self._table_dir(name), _POINTER)
        if not os.path.exists(ptr):
            return None
        return int(open(ptr).read().strip())

    def table_path(self, name: str) -> str:
        """Path of the current generation (what serving readers open)."""
        gen = self.current_generation(name)
        if gen is None:
            raise FileNotFoundError(f"table {name} has no published generation")
        return os.path.join(self._table_dir(name), f"gen={gen}")

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def refresh_all(self) -> dict[str, DataFrame]:
        """Materialize every level in order (the topological refresh loop,
        task.py:256-283), publishing each via generation-pointer flip."""
        materialized: dict[str, DataFrame] = {}
        for name, builder in self._levels:
            df = builder(materialized)
            tdir = self._table_dir(name)
            os.makedirs(tdir, exist_ok=True)
            prev = self.current_generation(name)
            gen = 0 if prev is None else prev + 1
            gen_dir = os.path.join(tdir, f"gen={gen}")
            df.write.mode("overwrite").option("compression", "zstd").parquet(gen_dir)
            # atomic publish: write pointer to temp file then rename
            tmp_ptr = os.path.join(tdir, _POINTER + ".tmp")
            with open(tmp_ptr, "w") as f:
                f.write(str(gen))
            os.replace(tmp_ptr, os.path.join(tdir, _POINTER))
            # retention: drop generations older than keep_generations
            cutoff = gen - self.keep_generations
            for entry in os.listdir(tdir):
                if entry.startswith("gen="):
                    g = int(entry.split("=", 1)[1])
                    if g <= cutoff:
                        shutil.rmtree(os.path.join(tdir, entry))
            materialized[name] = self.spark.read.parquet(gen_dir)
        return materialized
