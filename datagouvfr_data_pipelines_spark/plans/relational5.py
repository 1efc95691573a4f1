"""Catalog batch 5: the consolidation engine under the oracle gate, and a
partition-pruned range join."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.pipelines.consolidation import (
    SchemaVersion,
    conform_file,
    consolidate,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "m4_consolidation",
    oracle="""
    WITH f1 AS (
      SELECT doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars,
             'res-1' AS resource_id, '2024-01-01' AS last_modified
      FROM documents
    ), f2 AS (
      SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source, n_chars,
             'res-2' AS resource_id, '2024-06-01' AS last_modified
      FROM documents WHERE doc_id < 250
    ), unioned AS (
      SELECT * FROM f1 UNION ALL SELECT * FROM f2
    )
    SELECT doc_id, lang, source, n_chars, resource_id, last_modified
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY last_modified DESC, resource_id) AS rn
          FROM unioned WHERE doc_id IS NOT NULL)
    WHERE rn = 1
    """,
    tags=["M4", "U1", "P10", "O5"],
)
def m4_consolidation(spark, sf_dir):
    """§3.3 consolidation engine end-to-end under the oracle gate: two
    'resource files' with differing schemas (one missing n_chars, one
    missing lang) are conformed, unioned, gated on the required key and
    deduped keeping the most recently modified row per primaryKey."""
    docs = table(spark, sf_dir, "documents")
    schema = SchemaVersion(
        columns=["doc_id", "lang", "source", "n_chars"],
        types={"n_chars": "bigint"},
        required=["doc_id"],
        primary_key=["doc_id"],
        min_files=2,
    )
    f1 = docs.select("doc_id", "lang", "source")
    f2 = docs.where(F.col("doc_id") < 250).select("doc_id", "source", "n_chars")
    c1 = conform_file(f1, schema, "res-1", "2024-01-01")
    c2 = conform_file(f2, schema, "res-2", "2024-06-01")
    return consolidate([c1, c2], schema)


@register(
    "j9_pruned_range_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           l.l_extendedprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey >= 500 AND l.l_orderkey < 1500
    """,
    tags=["J9"],
)
def j9_pruned_range_join(spark, sf_dir):
    """J9: range-restricted equi-join — the reference's manual id-prefix
    batched join (dvf/geoloc/task_functions.py:111-154) as ONE join with
    the range predicate pushed to both parquet scans (min/max row-group
    skip); Catalyst infers the filter on the orders side from the join key."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_orderkey") >= 500) & (F.col("l_orderkey") < 1500)
    )
    orders = table(spark, sf_dir, "orders")
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "o_orderpriority", "l_extendedprice"
    )
