"""Catalog batch 3: embedding near-dup pairs, date sequences, accent
cleaning, per-label centroids, group-wise best-row selector."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.similarity import cosine, ivf_cell
from datagouvfr_data_pipelines_spark.operators.cleaning import clean_text, fold_accents
from datagouvfr_data_pipelines_spark.operators.windows import keep_best_row
from datagouvfr_data_pipelines_spark.plans.catalog import register, table

_DOT = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(a.embedding)),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      (acc, x) -> acc + x)"""
_NA = """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(a.embedding)),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))),
      (acc, x) -> acc + x))"""
_NB = """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(b.embedding)),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      (acc, x) -> acc + x))"""
_CELL = """CAST(32 * (embedding[1] >= 0)::INT + 16 * (embedding[2] >= 0)::INT
         + 8 * (embedding[3] >= 0)::INT + 4 * (embedding[4] >= 0)::INT
         + 2 * (embedding[5] >= 0)::INT + (embedding[6] >= 0)::INT AS INTEGER)"""


@register(
    "emb_neardup_pairs",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding, {_CELL} AS cell FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DOT} / ({_NA} * {_NB}), 6) AS sim
    FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round({_DOT} / ({_NA} * {_NB}), 6) >= 0.35
    """,
    tags=["similarity", "dedup-embedding"],
)
def emb_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup detection, IVF-bucketed: candidate pairs
    only within the same sign-bit cell (the scale path — O(n²/cells) not
    O(n²)), then exact cosine ≥ 0.35. One shuffle on the cell key.

    Round 13: the within-cell pair stage is the wave-3 Arrow kernel
    (``_cell_cosine_pairs``) instead of the interpreted-fold self-join —
    each cell ships its O(n·dim) vectors once and pair dots run as
    vectorized numpy in the JVM fold's exact IEEE order
    (``_seq_dots_block``), with the rounded threshold filter re-applied
    exactly JVM-side. Norms stay per-VECTOR, computed JVM-side before
    the kernel (bitwise the ``cosine`` denominators)."""
    from datagouvfr_data_pipelines_spark.functions.similarity import (
        _cell_cosine_pairs,
        norm,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        ivf_cell("embedding", 64).alias("cell"),
        norm("embedding").alias("nrm"),
    )
    cand = _cell_cosine_pairs(emb, "vec_id", "embedding", "cell", "nrm", 0.35)
    sim = F.round(F.col("__raw"), 6)
    return cand.select("id_a", "id_b", sim.alias("sim")).where(
        F.col("sim") >= 0.35
    )


@register(
    "scalar_month_sequence",
    oracle="""
    SELECT o_orderkey, CAST(m AS DATE) AS month_start
    FROM (SELECT o_orderkey,
                 unnest(generate_series(date_trunc('month', CAST(o_orderdate AS DATE)),
                                        date_trunc('month', CAST(o_orderdate AS DATE)) + INTERVAL 3 MONTH,
                                        INTERVAL 1 MONTH)) AS m
          FROM orders WHERE o_orderkey < 100)
    """,
    tags=["scalar-date", "J10"],
)
def scalar_month_sequence(spark, sf_dir):
    """§2.8 date family: month-list between two dates
    (utils/utils.py:61-81 month_range) via sequence + explode."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    start = F.trunc(F.to_date("o_orderdate"), "month")
    months = F.sequence(start, F.add_months(start, 3), F.expr("interval 1 month"))
    return orders.select(
        "o_orderkey", F.explode(months).alias("month_start")
    )


@register(
    "p9_accent_clean",
    oracle="""
    SELECT doc_id,
           strip_accents('Électricité Générale à Orléans — ' || source) AS label_folded,
           trim(regexp_replace('  ' || source || '   x  ', '\\s+', ' ', 'g')) AS cleaned,
           upper(strip_accents('àéîöù ÇA')) AS shouty
    FROM documents WHERE doc_id < 50
    """,
    tags=["P9"],
)
def p9_accent_clean(spark, sf_dir):
    """P9: unidecode-equivalent accent folding + whitespace normalization
    (schema/utils/consolidation.py:953-970, rna:64-77) as translate/regexp
    chains — validated against DuckDB's strip_accents."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        fold_accents(
            F.concat(F.lit("Électricité Générale à Orléans — "), F.col("source"))
        ).alias("label_folded"),
        clean_text(F.concat(F.lit("  "), F.col("source"), F.lit("   x  "))).alias(
            "cleaned"
        ),
        F.upper(fold_accents(F.lit("àéîöù ÇA"))).alias("shouty"),
    )


@register(
    "sim_label_centroids",
    oracle="""
    SELECT label,
           COUNT(*) AS nb,
           CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS e1_avg,
           CAST(SUM(CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS e2_avg,
           CAST(SUM(CAST(FLOOR(CAST(embedding[3] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS e3_avg,
           CAST(SUM(CAST(FLOOR(CAST(embedding[4] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS e4_avg
    FROM embeddings GROUP BY label
    """,
    tags=["similarity", "A2"],
)
def sim_label_centroids(spark, sf_dir):
    """Per-label centroid components (the training step of a real IVF index).

    Float sums are made shuffle-order-independent by quantizing each value
    to integer nano-units (``floor(double*1e9)``) and summing longs — exact
    in any order, and ``floor`` carries no rounding-convention ambiguity
    across engines (decimal casts of FLOAT do: DuckDB scales in float space).
    """
    emb = table(spark, sf_dir, "embeddings")
    aggs = [F.count(F.lit(1)).alias("nb")]
    for i in range(1, 5):
        q = F.floor(F.element_at("embedding", i).cast("double") * 1e9).cast("long")
        aggs.append(
            (F.sum(q).cast("double") / 1e9 / F.count(F.lit(1))).alias(f"e{i}_avg")
        )
    return emb.groupBy("label").agg(*aggs)


@register(
    "a11_preferred_row",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_mktsegment, c_acctbal
    FROM (SELECT *, row_number() OVER (
            PARTITION BY c_nationkey
            ORDER BY (c_mktsegment = 'BUILDING') DESC, c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn = 1
    """,
    tags=["A11", "W2"],
)
def a11_preferred_row(spark, sf_dir):
    """A11: group-wise custom selector — prefer a flagged row, else the max
    (dvf/explore/task_functions.py:398-412 NaN-end-date preference), as a
    single row_number window instead of a groupby-apply."""
    cust = table(spark, sf_dir, "customer")
    return keep_best_row(
        cust,
        ["c_nationkey"],
        [
            (F.col("c_mktsegment") == "BUILDING").desc(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        ],
    ).select("c_nationkey", "c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "emb_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT vec_id, embedding, {_CELL} AS cell FROM embeddings
    ), p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round({_DOT} / ({_NA} * {_NB}), 6) >= 0.35
    ), und AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION SELECT id_b, id_a FROM p
    ), nodes AS (
      SELECT DISTINCT src AS node FROM und
    ), r AS (
      SELECT node, node AS reach FROM nodes
      UNION
      SELECT r.node, u.dst AS reach FROM r JOIN und u ON u.src = r.reach
    )
    SELECT node AS vec_id, CAST(min(reach) AS BIGINT) AS component
    FROM r GROUP BY node
    """,
    tags=["similarity", "dedup-embedding", "connected-components"],
)
def emb_neardup_clusters(spark, sf_dir):
    """Embedding near-dup CLUSTERS: the IVF-bucketed pair generation of
    ``emb_neardup_pairs`` fed through true connected components
    (operators/graph.py), so transitively-linked duplicates collapse to one
    canonical (minimum) vec_id even across chains the pairwise view never
    joins directly. The oracle replays the pair SQL through a recursive
    reachability CTE."""
    from datagouvfr_data_pipelines_spark.operators.graph import (
        connected_components,
    )
    from datagouvfr_data_pipelines_spark.plans.catalog import CATALOG

    pairs = CATALOG["emb_neardup_pairs"].fn(spark, sf_dir).select(
        "id_a", "id_b"
    )
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("vec_id"), "component"
    )
