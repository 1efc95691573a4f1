"""Catalog batch 14 (round 3): embedding-pipeline completion — int8
vector quantization for serving and contrastive triplet generation for
representation training. Both oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


@register(
    "emb_int8_quantize",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS amax
      FROM embeddings
    )
    SELECT vec_id, i - 1 AS dim,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                      * (127.0 / CAST(amax AS DOUBLE))) AS BIGINT) AS q
    FROM base, (SELECT UNNEST(range(1, 65)) AS i)
    WHERE amax > 0 AND vec_id < 200
    """,
    tags=["embedding", "quantization", "serving"],
)
def emb_int8_quantize(spark, sf_dir):
    """Symmetric int8 vector quantization (the standard serving
    compression: 4x smaller scans, SIMD int dot products): per vector,
    scale = 127/max|x|, q_i = floor(x_i * scale). max-abs is a SELECTION
    over floats (bit-stable), the scale/product/floor chain is identical
    double arithmetic on both engines — so even quantized codes are
    hash-exact. Shuffle-free: one projection + posexplode; at 100 TB the
    quantized table is what the ANN tier scans. Output exploded to
    (vec_id, dim, q) scalar rows (driver-canonicalizable)."""
    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    base = emb.select("vec_id", "embedding", amax.alias("amax")).where(
        F.col("amax") > 0
    )
    scale = F.lit(127.0) / F.col("amax").cast("double")
    return base.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * scale).cast("bigint"),
            )
        ).alias("dim", "q"),
    )


SEGMENT_RECIPE = {
    "table": "orders",
    "filter": "o_orderdate >= TIMESTAMP '1997-01-01'",
    "join": [
        {
            "table": "customer",
            "on": "o_custkey = c_custkey",
            "broadcast": True,
        }
    ],
    "derive": {"order_year": "CAST(year(o_orderdate) AS INT)"},
    "group_by": ["c_mktsegment", "order_year"],
    "agg": {
        "nb_orders": "count(1)",
        "total": "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)",
    },
    "order_by": ["total DESC", "c_mktsegment"],
    "limit": 15,
}


@register(
    "r1_recipe_segment_totals",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS nb_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c.c_mktsegment, order_year
    ORDER BY total DESC, c.c_mktsegment
    LIMIT 15
    """,
    tags=["recipe", "declarative", "J1", "A3"],
)
def r1_recipe_segment_totals(spark, sf_dir):
    """Declarative recipe execution (plans/recipe.py): this query IS a
    checked-in config dict — filter, broadcast join, derived year,
    decimal-exact aggregate, ordered limit — compiled to an ordinary
    Catalyst plan. Proves the compiler adds no semantics of its own: the
    oracle is the mechanical SQL transliteration of the same spec, and
    the compiled plan keeps every engine guarantee (pushdown, broadcast,
    partial agg) because it is a plain DataFrame expression tree."""
    from datagouvfr_data_pipelines_spark.plans.recipe import compile_recipe

    return compile_recipe(
        SEGMENT_RECIPE, lambda t: table(spark, sf_dir, t)
    )


@register(
    "asm_contrastive_triplets",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             LEAD(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS positive_id
      FROM documents
    ),
    langs AS (
      SELECT lang,
             COALESCE(LEAD(lang) OVER (ORDER BY lang),
                      (SELECT MIN(lang) FROM documents)) AS next_lang
      FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT a.doc_id AS anchor_id, a.positive_id,
           n.doc_id AS negative_id, a.lang AS anchor_lang,
           n.lang AS negative_lang
    FROM ranked a
    JOIN langs l ON l.lang = a.lang
    JOIN ranked n ON n.lang = l.next_lang AND n.rn = a.rn
    WHERE a.positive_id IS NOT NULL
    """,
    tags=["assembly", "contrastive", "triplets", "ml-prep"],
)
def asm_contrastive_triplets(spark, sf_dir):
    """Contrastive (anchor, positive, negative) triplet generation for
    representation training: positive = the anchor's same-language
    successor (a weak-supervision proxy any metadata key can play),
    negative = the rank-aligned document from the cyclically NEXT
    language — deterministic, join-based, and uniform across languages,
    never a random sample that shifts between runs. Windows are
    partitioned by lang; the lang successor map is a tiny driver
    broadcast (same driver-scalar pattern as kmeans centroids). One
    shuffle on lang for the windows, one rank-aligned equi-join."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.lead("doc_id").over(w).alias("positive_id"),
    )
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    succ = {lang: langs[(i + 1) % len(langs)] for i, lang in enumerate(langs)}
    succ_map = F.create_map(
        *[x for k, v in succ.items() for x in (F.lit(k), F.lit(v))]
    )
    anchors = ranked.where(F.col("positive_id").isNotNull()).withColumn(
        "next_lang", succ_map[F.col("lang")]
    )
    negatives = ranked.select(
        F.col("doc_id").alias("negative_id"),
        F.col("lang").alias("negative_lang"),
        F.col("rn").alias("nrn"),
    )
    return anchors.join(
        negatives,
        (F.col("next_lang") == F.col("negative_lang"))
        & (F.col("rn") == F.col("nrn")),
    ).select(
        F.col("doc_id").alias("anchor_id"),
        "positive_id",
        "negative_id",
        F.col("lang").alias("anchor_lang"),
        "negative_lang",
    )
