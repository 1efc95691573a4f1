"""Catalog batch 17 (round 5): the faithful HAProxy weblog parse chain as
an oracle-checked query.

The five-type metrics port (pipelines/metrics.py, golden-file checked
byte-level against the reference's dgv/metrics/test fixtures) is also
exercised here against the driver's synthetic tables: HAProxy-format lines
are SYNTHESIZED from the events table with deterministic column
expressions — identical concat logic both engines — then pushed through
the full priority-ordered extract chain (35 patterns, first-match-wins,
empty-capture fall-through) and aggregated. The DuckDB oracle generates
the SAME CASE chain from the same pattern table, so regex semantics
(greedy ``.*`` backtracking, character classes, the RGS/status/GET gate)
are verified cross-engine on real data volume, not just the 42-line golden
log.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


def _line_spark():
    """HAProxy-ish access line built from events columns (pure concat)."""
    u = F.col("user_id").cast("string")
    e = F.col("event_id").cast("string")
    url = (
        F.when(F.col("event_type") == "view", F.concat(F.lit("/fr/datasets/ds-"), u))
        .when(F.col("event_type") == "click", F.concat(F.lit("/api/2/datasets/ds-"), u))
        .when(
            F.col("event_type") == "purchase",
            F.concat(F.lit("/api/1/datasets/r/res-"), e),
        )
        .when(F.col("event_type") == "signup", F.concat(F.lit("/en/reuses/ru-"), u))
        .otherwise(F.concat(F.lit("/fr/organizations/org-"), u))
    )
    status = (
        F.when(F.col("event_id") % 7 == 0, F.lit("404"))
        .when(F.col("event_id") % 3 == 0, F.lit("302"))
        .otherwise(F.lit("200"))
    )
    method = F.when(F.col("event_id") % 11 == 0, F.lit("POST")).otherwise(
        F.lit("GET")
    )
    gate = F.when(
        F.col("event_id") % 13 == 0, F.lit("DATAGOUVFR_TEST~")
    ).otherwise(F.lit("DATAGOUVFR_RGS~"))
    return F.concat(
        F.lit("2025-08-28T00:00:00 slb-04 haproxy[1]: 127.0.0.1:1 [x] "),
        gate,
        F.lit(" BACK/dataweb 0/0/1/1/+1 "),
        status,
        F.lit(' +100 - - --NN 1/1/1/0/0 0/0 "'),
        method,
        F.lit(" "),
        url,
        F.lit(' HTTP/1.1"'),
    )


_LINE_SQL = """
      '2025-08-28T00:00:00 slb-04 haproxy[1]: 127.0.0.1:1 [x] '
      || CASE WHEN event_id % 13 = 0 THEN 'DATAGOUVFR_TEST~'
              ELSE 'DATAGOUVFR_RGS~' END
      || ' BACK/dataweb 0/0/1/1/+1 '
      || CASE WHEN event_id % 7 = 0 THEN '404'
              WHEN event_id % 3 = 0 THEN '302' ELSE '200' END
      || ' +100 - - --NN 1/1/1/0/0 0/0 "'
      || CASE WHEN event_id % 11 = 0 THEN 'POST' ELSE 'GET' END
      || ' '
      || CASE WHEN event_type = 'view'
                THEN '/fr/datasets/ds-' || CAST(user_id AS VARCHAR)
              WHEN event_type = 'click'
                THEN '/api/2/datasets/ds-' || CAST(user_id AS VARCHAR)
              WHEN event_type = 'purchase'
                THEN '/api/1/datasets/r/res-' || CAST(event_id AS VARCHAR)
              WHEN event_type = 'signup'
                THEN '/en/reuses/ru-' || CAST(user_id AS VARCHAR)
              ELSE '/fr/organizations/org-' || CAST(user_id AS VARCHAR) END
      || ' HTTP/1.1"'
"""


def _extract_case_sql(field: str) -> str:
    """Mirror extract_hits_typed's priority CASE for one output field,
    generated from the SAME pattern table the Spark chain uses."""
    from datagouvfr_data_pipelines_spark.pipelines.metrics import (
        weblog_pattern_table,
    )

    whens = []
    for obj_type, segment, pattern in weblog_pattern_table():
        pat = pattern.replace("'", "''")
        value = {
            "object_type": f"'{obj_type}'",
            "id": f"regexp_extract(line, '{pat}', 1)",
            "segment": f"'{segment}'",
        }[field]
        whens.append(
            f"WHEN regexp_extract(line, '{pat}', 1) <> '' THEN {value}"
        )
    return "CASE " + " ".join(whens) + " ELSE NULL END"


@register(
    "m5_weblog_hits",
    oracle=f"""
    WITH lines AS MATERIALIZED (
      SELECT {_LINE_SQL} AS line FROM events
    ),
    hits AS MATERIALIZED (
      SELECT {_extract_case_sql("object_type")} AS object_type,
             {_extract_case_sql("id")} AS id,
             {_extract_case_sql("segment")} AS segment
      FROM lines
    )
    SELECT object_type, segment,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_ids
    FROM hits WHERE object_type IS NOT NULL
    GROUP BY object_type, segment
    """,
    tags=["metrics", "weblog", "regex", "S7"],
)
def m5_weblog_hits(spark, sf_dir):
    """Synthesize HAProxy lines from events, run the five-type extract
    chain (pipelines/metrics.py:extract_hits_typed — one scan, 35
    priority-ordered JVM regexes), and count hits + distinct objects per
    (object_type, segment). The gate rejects POSTs, 404s and non-RGS
    lines exactly like the reference's global pattern; 'error' events
    fall to the organizations path, exercising the default-segment
    patterns. Oracle: the same CASE chain generated from the same pattern
    table, run by DuckDB's RE2 — cross-engine regex-semantics pin at data
    volume."""
    from datagouvfr_data_pipelines_spark.pipelines.metrics import (
        extract_hits_typed,
    )

    ev = table(spark, sf_dir, "events")
    lines = ev.select(_line_spark().alias("value"))
    hits = extract_hits_typed(lines, "1900-01-01")
    return (
        hits.groupBy("object_type", "segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.countDistinct("id").cast("bigint").alias("n_ids"),
        )
        .orderBy("object_type", "segment")
    )


@register(
    "u7_record_field_diff",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_price
      FROM orders
    ),
    n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN '9-SYNTH'
                  ELSE o_orderpriority END AS o_orderpriority,
             CAST(CASE WHEN o_orderkey % 7 = 0
                       THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
                       ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
                  AS DECIMAL(18,2)) AS o_price
      FROM orders
    ),
    j AS (
      SELECT o.o_orderkey,
             o.o_orderstatus AS so, n.o_orderstatus AS sn,
             o.o_orderpriority AS po, n.o_orderpriority AS pn,
             o.o_price AS vo, n.o_price AS vn
      FROM o JOIN n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, 'o_orderstatus' AS "column",
           CAST(so AS VARCHAR) AS old_value, CAST(sn AS VARCHAR) AS new_value
    FROM j WHERE so IS DISTINCT FROM sn
    UNION ALL
    SELECT o_orderkey, 'o_orderpriority', CAST(po AS VARCHAR), CAST(pn AS VARCHAR)
    FROM j WHERE po IS DISTINCT FROM pn
    UNION ALL
    SELECT o_orderkey, 'o_price', CAST(vo AS VARCHAR), CAST(vn AS VARCHAR)
    FROM j WHERE vo IS DISTINCT FROM vn
    """,
    tags=["setops", "cdc", "U2", "field-diff"],
)
def u7_record_field_diff(spark, sf_dir):
    """Per-record field-level diff between two dimension snapshots — the
    engine form of the reference's DiffManager.get_diff
    (verticales/simplifions/diff_manager.py: which Grist record fields
    actually changed, with volatile metadata keys ignored). A synthetic
    'after' snapshot perturbs status (%5), priority (%11) and price (%7)
    and touches the IGNORED o_orderdate column (%3) — records whose only
    change is ignored produce no rows, like the reference's None diff.
    One key join + per-row array filter/explode
    (operators/setops.py:record_field_diff); decimal-string casts keep
    values engine-identical."""
    from datagouvfr_data_pipelines_spark.operators.setops import (
        record_field_diff,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_price"),
        "o_orderdate",
    )
    k = F.col("o_orderkey")
    new = o.withColumns(
        {
            "o_orderstatus": F.when(k % 5 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
            "o_orderpriority": F.when(k % 11 == 0, F.lit("9-SYNTH")).otherwise(
                F.col("o_orderpriority")
            ),
            "o_price": F.when(k % 7 == 0, F.col("o_price") * 2)
            .otherwise(F.col("o_price"))
            .cast("decimal(18,2)"),
            # volatile metadata churn that must NOT surface in the diff
            # (the role o_comment/Modifie_le plays in the reference)
            "o_orderdate": F.when(
                k % 3 == 0, F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")
            ).otherwise(F.col("o_orderdate")),
        }
    )
    return record_field_diff(
        o, new, ["o_orderkey"], ignore_cols=["o_orderdate"]
    ).orderBy("o_orderkey", "column")
