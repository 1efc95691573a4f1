"""Dataset-assembly query catalog: chunking, splits, stratified sampling
(operators/assembly.py). All three oracle-checked — the split/sample tier
is deliberately built from ANSI-reproducible arithmetic so membership is
auditable outside Spark.
"""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.plans.catalog import register, table
from datagouvfr_data_pipelines_spark.plans.text_pipeline import _TOKENS_SQL

_ROLLING_SQL = """
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      (acc, x) -> (acc * 131 + x) % 2147483647
    )
""".strip()

_CHUNK, _OVERLAP = 32, 8
_STEP = _CHUNK - _OVERLAP


@register(
    "asm_chunked_docs",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS_SQL} AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    st AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - {_OVERLAP}, 1) + 1, {_STEP})) AS s
      FROM tk
    )
    SELECT doc_id,
           CAST((s - 1) // {_STEP} AS INTEGER) AS chunk_id,
           array_to_string(t[s:least(s + {_CHUNK} - 1, len(t))], ' ') AS chunk_text,
           CAST(least({_CHUNK}, len(t) - s + 1) AS INTEGER) AS n_chunk_tokens
    FROM st
    """,
    tags=["assembly", "chunking"],
)
def asm_chunked_docs(spark, sf_dir):
    """Overlapping token-window chunking — context-window packing prep;
    shuffle-free explode whose chunk ids are partition-stable."""
    from datagouvfr_data_pipelines_spark.operators.assembly import chunk_documents

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", chunk_size=_CHUNK, overlap=_OVERLAP)


@register(
    "asm_hash_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_ROLLING_SQL} % 100 AS bucket FROM documents
    )
    SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=["assembly", "split"],
)
def asm_hash_split(spark, sf_dir):
    """Deterministic content-keyed train/val/test split: same text -> same
    split across rebuilds, preventing train/test contamination."""
    from datagouvfr_data_pipelines_spark.operators.assembly import hash_split

    docs = table(spark, sf_dir, "documents")
    return hash_split(docs, "text").select("doc_id", "bucket", "split")


@register(
    "asm_stratified_sample",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_ROLLING_SQL} ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM r WHERE rn <= 5
    """,
    tags=["assembly", "sampling"],
)
def asm_stratified_sample(spark, sf_dir):
    """Exactly-5-per-language deterministic sample via (content hash, id)
    total order inside each stratum."""
    from datagouvfr_data_pipelines_spark.operators.assembly import stratified_sample

    docs = table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", 5, "doc_id", "text").select(
        "doc_id", "lang", "source"
    )


_BUDGET = 64


@register(
    "asm_packed_sequences",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS_SQL} AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    ch AS (
      SELECT doc_id,
             CAST((s - 1) // {_STEP} AS INTEGER) AS chunk_id,
             CAST(least({_CHUNK}, len(t) - s + 1) AS INTEGER) AS n_chunk_tokens
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(len(t) - {_OVERLAP}, 1) + 1, {_STEP})) AS s
            FROM tk)
    ),
    o AS (
      SELECT doc_id, chunk_id, n_chunk_tokens,
             coalesce(SUM(n_chunk_tokens) OVER (
               ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS goff
      FROM ch
    )
    SELECT doc_id, chunk_id, n_chunk_tokens,
           CAST(goff // {_BUDGET} AS BIGINT) AS pack_id,
           CAST(goff % {_BUDGET} AS BIGINT) AS pack_offset
    FROM o
    """,
    tags=["assembly", "packing"],
)
def asm_packed_sequences(spark, sf_dir):
    """Chunk then pack into {_BUDGET}-token budgets via the distributed
    prefix-sum (the oracle's single global window is exactly what the
    operator refuses to do at scale — bucketed cumsum + driver-folded
    prefix offsets give the identical numbering)."""
    from datagouvfr_data_pipelines_spark.operators.assembly import (
        chunk_documents,
        pack_sequences,
    )

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", chunk_size=_CHUNK, overlap=_OVERLAP)
    packed = pack_sequences(
        chunks, "doc_id", ["doc_id", "chunk_id"], "n_chunk_tokens", _BUDGET
    )
    return packed.select("doc_id", "chunk_id", "n_chunk_tokens", "pack_id", "pack_offset")


@register(
    "q_quarantine_summary",
    oracle="""
    WITH v AS (
      SELECT unnest(list_filter([
        CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE) THEN 'discount_cap' END,
        CASE WHEN NOT coalesce(l_tax < 0.08, FALSE) THEN 'tax_cap' END,
        CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 'qty_cap' END
      ], x -> x IS NOT NULL)) AS violated_rule
      FROM lineitem
    )
    SELECT violated_rule, COUNT(*) AS n_rows FROM v GROUP BY violated_rule
    """,
    tags=["quality", "quarantine"],
)
def q_quarantine_summary(spark, sf_dir):
    """Declarative expectations gate over lineitem: per-rule violation
    counts from the single-scan quarantine split (null-fails-closed)."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.quality import quarantine_split

    li = table(spark, sf_dir, "lineitem")
    _, violations = quarantine_split(
        li,
        {
            "discount_cap": F.col("l_discount") <= 0.05,
            "tax_cap": F.col("l_tax") < 0.08,
            "qty_cap": F.col("l_quantity") <= 45,
        },
    )
    return violations.groupBy("violated_rule").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
