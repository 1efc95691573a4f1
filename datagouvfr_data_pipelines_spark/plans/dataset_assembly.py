"""Dataset-assembly query catalog: chunking, splits, stratified sampling
(operators/assembly.py). All three oracle-checked — the split/sample tier
is deliberately built from ANSI-reproducible arithmetic so membership is
auditable outside Spark.
"""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.plans.catalog import register, table
from datagouvfr_data_pipelines_spark.plans.text_pipeline import _TOKENS_SQL

# DuckDB twin of functions/text.py:fingerprint_md5 — first 60 bits of md5
# as int64; `||` (not concat) so NULL text stays NULL on both engines.
_MD5_SQL = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"

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
      SELECT doc_id, {_MD5_SQL} % 100 AS bucket FROM documents
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
               ORDER BY {_MD5_SQL} ASC, doc_id ASC
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
    "asm_decontaminate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks
      FROM documents WHERE length(trim(text)) > 0
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM t
    ),
    bench AS (SELECT DISTINCT unnest(sh) AS ng FROM s WHERE doc_id < 50),
    corp AS (
      SELECT doc_id, unnest(sh) AS ng FROM s WHERE doc_id >= 50
    ),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS nc
      FROM corp c JOIN bench b ON c.ng = b.ng
      GROUP BY c.doc_id
    )
    SELECT s.doc_id,
           CAST(coalesce(h.nc, 0) AS BIGINT) AS n_contaminated_ngrams,
           coalesce(h.nc, 0) > 0 AS is_contaminated
    FROM s LEFT JOIN hits h USING (doc_id)
    WHERE s.doc_id >= 50
    """,
    tags=["assembly", "decontamination"],
)
def asm_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag corpus docs (doc_id >= 50) sharing any
    word 3-gram with the 'eval set' (doc_id < 50). Broadcast the tiny bench
    n-gram set; only matches are ever shuffled."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.assembly import (
        ngram_decontaminate,
    )

    docs = table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    corpus = docs.where(F.col("doc_id") >= 50)
    bench = docs.where(F.col("doc_id") < 50)
    return ngram_decontaminate(corpus, bench, "doc_id", "text", n=3).select(
        "doc_id", "n_contaminated_ngrams", "is_contaminated"
    )


_DOMAIN_BUDGET = 1500


@register(
    "asm_budget_select",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens,
             {_MD5_SQL} AS prio
      FROM documents WHERE length(trim(text)) > 0
    ),
    o AS (
      SELECT doc_id, source, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY prio ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before
      FROM t
    )
    SELECT doc_id, source, n_tokens, tokens_before
    FROM o WHERE tokens_before < {_DOMAIN_BUDGET}
    """,
    tags=["assembly", "mixture"],
)
def asm_budget_select(spark, sf_dir):
    """Token-budgeted mixture selection: per source domain, keep docs in
    (content-hash, id) priority order until {_DOMAIN_BUDGET} tokens — the
    weights->documents step of mixture construction."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.functions.text import (
        fingerprint_md5,
        token_count_ws,
    )
    from datagouvfr_data_pipelines_spark.operators.assembly import budget_select

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "source",
            token_count_ws("text").alias("n_tokens"),
            fingerprint_md5("text").alias("__prio"),
        )
    )
    return budget_select(
        docs, "source", "n_tokens", _DOMAIN_BUDGET, ["__prio", "doc_id"]
    ).select("doc_id", "source", "n_tokens", "tokens_before")


@register(
    "g_connected_components",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    ), und AS (
      SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e
    ), r AS (
      SELECT doc_id AS node, doc_id AS reach FROM documents
      UNION
      SELECT r.node, u.dst AS reach FROM r JOIN und u ON u.src = r.reach
    )
    SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS component
    FROM r GROUP BY node
    """,
    tags=["graph", "connected-components"],
)
def g_connected_components(spark, sf_dir):
    """Connected components (alternating large-star/small-star) over
    same-lang consecutive-id chains: each run of consecutive documents in
    one language collapses to its minimum doc_id. The oracle is a recursive
    reachability CTE — exponential-path-free only because UNION dedups —
    which is exactly why the Spark side uses the O(log^2 n) star algorithm
    instead."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.graph import (
        connected_components,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    a, b = docs.alias("a"), docs.alias("b")
    edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1)
        & (F.col("a.lang") == F.col("b.lang")),
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    cc = connected_components(edges, "src", "dst")
    # isolated docs (no same-lang neighbor) are their own component
    return docs.join(
        cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
    )


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


@register(
    "asm_dsir_weights",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), bk AS (
      SELECT doc_id, tgt,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(tok, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647) % 1024 AS bkt
      FROM tk WHERE length(tok) > 0
    ), g AS (
      SELECT doc_id, tgt, bkt, CAST(COUNT(*) AS BIGINT) AS n
      FROM bk GROUP BY 1, 2, 3
    ), src AS (
      SELECT bkt, CAST(SUM(n) AS BIGINT) AS sc,
             CAST(SUM(CASE WHEN tgt THEN n ELSE 0 END) AS BIGINT) AS tc
      FROM g GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(sc) AS BIGINT) AS s, CAST(SUM(tc) AS BIGINT) AS t
      FROM src
    ), ratio AS (
      SELECT bkt,
             CAST(FLOOR((ln(tc + 1) - ln(t + 1024)
                         - ln(sc + 1) + ln(s + 1024)) * 1000000)
                  AS BIGINT) AS lr_micro
      FROM src, tot
    )
    SELECT g.doc_id,
           CAST(SUM(g.n) AS BIGINT) AS n_toks,
           CAST(SUM(g.n * ratio.lr_micro) AS BIGINT) AS dsir_micro
    FROM g JOIN ratio USING (bkt)
    GROUP BY 1
    """,
    tags=["llm-pipeline", "data-selection", "dsir", "hash-exact"],
)
def asm_dsir_weights(spark, sf_dir):
    """DSIR data-selection weights with lang='en' as the target domain:
    hashed-unigram log-likelihood-ratio per document, exact-integer
    micro-nat totals (operators/assembly.py:dsir_importance_weights).
    The positive tail is what importance RESAMPLING would keep to shift
    the corpus toward the target; weights are bit-equal to the oracle
    because every float op runs on integer inputs and the per-bucket
    ratio is floor-quantized before the (order-sensitive) summation."""
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.assembly import (
        dsir_importance_weights,
    )

    docs = table(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=1024
    )
