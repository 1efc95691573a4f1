"""Hierarchy / graph operators (SURVEY §1.1 geozones row).

Reference: INSEE ``subdivisionDirecteDe`` edges -> transitive closure of
ancestors per zone, computed with Python dict walks
(data_processing/geozones/task_functions.py:53-177).

Spark-first: iterative self-join to a fixpoint. Each iteration doubles the
reachable path length (frontier joins onto the full closure-so-far), so
depth-d hierarchies converge in O(log d) joins, each a shuffled equi-join —
the standard distributed transitive-closure recipe. Administrative
hierarchies are depth <= ~6, so 3 iterations suffice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 12,
) -> DataFrame:
    """All (descendant, ancestor) pairs from direct (child, parent) edges.

    Loop-until-fixpoint with doubling: closure ∪= closure ⋈ closure until no
    new pairs. Each pass caches the closure to stop lineage growth — on a
    cluster this is what keeps iteration N from recomputing passes 1..N-1.
    """
    closure = edges.select(
        F.col(child_col).alias("descendant"), F.col(parent_col).alias("ancestor")
    ).distinct()
    closure.cache()
    n = closure.count()
    for _ in range(max_iterations):
        hops = (
            closure.alias("a")
            .join(
                closure.alias("b"),
                F.col("a.ancestor") == F.col("b.descendant"),
            )
            .select(
                F.col("a.descendant").alias("descendant"),
                F.col("b.ancestor").alias("ancestor"),
            )
        )
        new_closure = closure.unionByName(hops).distinct()
        new_closure.cache()
        new_n = new_closure.count()
        closure.unpersist()
        closure = new_closure
        if new_n == n:
            break
        n = new_n
    return closure


def ancestors_per_node(closure: DataFrame) -> DataFrame:
    """geozones output shape: one row per zone with its sorted ancestor list
    (geozones/task_functions.py:120-177)."""
    return closure.groupBy("descendant").agg(
        F.sort_array(F.collect_set("ancestor")).alias("ancestors"),
        F.count(F.lit(1)).alias("n_ancestors"),
    )
