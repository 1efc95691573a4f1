"""Catalog batch (round 5): cross-document span extraction and semantic
(embedding-cluster) dedup — the removable-region and SemDeDup tiers of the
LLM training-data pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table

_SPAN_N = 7
_SPAN_MIN_DOCS = 2


def _cross_doc_spans_oracle(n: int = _SPAN_N, min_docs: int = _SPAN_MIN_DOCS) -> str:
    """DuckDB replica of the full span pipeline: positioned n-grams ->
    distinct-doc counts -> marked positions -> gaps-and-islands interval
    merge (two marked positions share a span when pos - prev <= n)."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(generate_series(1, len(toks) - {n - 1})) - 1 AS pos,
             unnest(list_transform(generate_series(1, len(toks) - {n - 1}),
                    i -> array_to_string(toks[i : i + {n - 1}], ' '))) AS gm
      FROM t WHERE len(toks) >= {n}
    ), sh AS (
      SELECT gm FROM g GROUP BY gm HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN sh USING (gm)
    ), isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > {n} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hits)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {n} AS BIGINT) AS span_end,
           CAST(MAX(pos) + {n} - MIN(pos) AS BIGINT) AS span_words,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, island
    """


@register(
    "t_cross_doc_spans",
    oracle=_cross_doc_spans_oracle(),
    tags=["dedup", "spans", "text-pipeline"],
)
def t_cross_doc_spans(spark, sf_dir):
    """Cross-document duplicated-span EXTRACTION (Lee et al. 2022 n-gram
    approximation): maximal merged word-offset regions whose every covering
    n-gram occurs in >= 2 distinct documents — the regions a
    remove-duplicated-text pass would cut, where ``duplicated_span_stats``
    only scores them. Linear plan: explode -> two-phase distinct-doc count
    -> semi-join -> per-document interval-merge window; no pair expansion,
    so no bucket caps. Oracle-checked with the raw-gram (portable) keys;
    production callers default to xxhash64 keys."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        cross_doc_repeated_spans,
    )

    docs = table(spark, sf_dir, "documents")
    return cross_doc_repeated_spans(
        docs, "doc_id", "text", n=_SPAN_N, min_docs=_SPAN_MIN_DOCS, portable=True
    )


_CHARLM_ORACLE = """
    WITH t AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS c
      FROM documents
    ), b AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(c) - 1),
             i -> c[i : i + 1])) AS bg
      FROM t WHERE len(c) >= 2
    ), dc AS (
      SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY doc_id, bg
    ), gc AS (
      SELECT bg, SUM(cnt) AS c_bg FROM dc GROUP BY bg
    ), pc AS (
      SELECT bg[1:1] AS pre, SUM(c_bg) AS c_pre FROM gc GROUP BY 1
    ), vv AS (
      SELECT COUNT(*) AS v FROM (
        SELECT bg[1:1] AS ch FROM gc UNION SELECT bg[2:2] FROM gc)
    )
    SELECT dc.doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           (CAST(SUM(cnt * CAST(FLOOR(
                (ln(c_pre + (SELECT v FROM vv)) - ln(c_bg + 1)) * 1000000000.0
              ) AS BIGINT)) AS DOUBLE) / 1000000000.0)
             / CAST(SUM(cnt) AS DOUBLE) AS avg_nll
    FROM dc JOIN gc USING (bg) JOIN pc ON pc.pre = dc.bg[1:1]
    GROUP BY dc.doc_id
    """


@register(
    "t_charlm_nll",
    oracle=_CHARLM_ORACLE,
    tags=["text-pipeline", "quality", "perplexity"],
)
def t_charlm_nll(spark, sf_dir):
    """Perplexity-proxy quality filter: per-document average NLL under an
    add-one-smoothed char-bigram LM trained on the corpus itself
    (CCNet/KenLM-style filtering). Every log is ln of an INTEGER (count
    + smoothing), so the whole model reproduces bit-identically in DuckDB;
    per-bigram terms are nano-quantized before the per-doc sum. Global
    bigram/prefix tables are alphabet^2-bounded broadcasts re-aggregated
    from the (doc, bigram) partials — one scan, one doc-key shuffle."""
    from datagouvfr_data_pipelines_spark.functions.text import charlm_nll_scores

    docs = table(spark, sf_dir, "documents")
    return charlm_nll_scores(docs, "doc_id", "text")


def _span_scrub_oracle(n: int = _SPAN_N, min_docs: int = _SPAN_MIN_DOCS) -> str:
    """DuckDB replica of the span REMOVER: shared-gram positions with a
    canonical (min-doc) flag -> per-doc marked + protected position lists
    -> index-aware token filter (cut iff covered by a marked interval and
    NOT by a protected canonical interval) -> re-joined text. Mirrors the
    range-protected keep-one semantics of ``remove_cross_doc_spans``."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(generate_series(1, len(toks) - {n - 1})) - 1 AS pos,
             unnest(list_transform(generate_series(1, len(toks) - {n - 1}),
                    i -> array_to_string(toks[i : i + {n - 1}], ' '))) AS gm
      FROM t WHERE len(toks) >= {n}
    ), sh AS (
      SELECT gm, MIN(doc_id) AS fd FROM g GROUP BY gm
      HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ), hits AS (
      SELECT g.doc_id, g.pos, g.doc_id = sh.fd AS canon
      FROM g JOIN sh USING (gm)
    ), mp AS (
      SELECT doc_id,
             COALESCE(list(pos ORDER BY pos) FILTER (WHERE NOT canon),
                      []) AS mp,
             COALESCE(list(pos ORDER BY pos) FILTER (WHERE canon),
                      []) AS pp
      FROM hits GROUP BY doc_id
    ), cut AS (
      SELECT b.doc_id, b.toks,
             CASE WHEN m.mp IS NULL THEN b.toks
                  ELSE list_filter(
                         list_transform(generate_series(1, len(b.toks)),
                           i -> CASE WHEN len(list_filter(m.mp,
                                      p -> p <= i - 1 AND i - 1 < p + {n})) = 0
                                     OR len(list_filter(m.pp,
                                      p -> p <= i - 1 AND i - 1 < p + {n})) > 0
                                     THEN b.toks[i] END),
                         x -> x IS NOT NULL)
             END AS kept
      FROM t b LEFT JOIN mp m USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed_words,
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM cut
    """


@register(
    "t_span_scrubbed_docs",
    oracle=_span_scrub_oracle(),
    tags=["dedup", "spans", "text-pipeline", "transform"],
)
def t_span_scrubbed_docs(spark, sf_dir):
    """Duplicated-text REMOVAL (the transform step of Lee et al. 2022):
    cross-document shared regions are cut from every document except the
    gram's smallest-id (canonical) one, and the surviving tokens re-joined
    — one row per input document with the removed-word count. The linear
    marked-position pass plus a per-ROW higher-order token filter; no
    second shuffle beyond the per-doc position collect."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        remove_cross_doc_spans,
    )

    docs = table(spark, sf_dir, "documents")
    return remove_cross_doc_spans(
        docs, "doc_id", "text", n=_SPAN_N, min_docs=_SPAN_MIN_DOCS, portable=True
    )


_SEM_K = 8
_SEM_ITERS = 2
_SEM_DIM = 64
_SEM_TAU = 0.35
_SEM_MAX_CELL = 10_000


def _semantic_dedup_oracle(
    k: int = _SEM_K,
    iterations: int = _SEM_ITERS,
    dim: int = _SEM_DIM,
    tau: float = _SEM_TAU,
    max_cell: int = _SEM_MAX_CELL,
) -> str:
    """DuckDB replica of the FULL SemDeDup pipeline: the shared portable
    k-means CTE chain (text_pipeline._kmeans_af_ctes) -> per-vector
    centroid cosine -> within-cell pairwise cosine -> keep-farthest drop
    votes -> kept/dropped status."""
    from datagouvfr_data_pipelines_spark.plans.text_pipeline import (
        _km_norm,
        _kmeans_af_ctes,
    )

    norm = _km_norm(dim)
    cf = f"c{iterations}"

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
            f"(acc, x) -> acc + x)"
        )

    return f"""
    {_kmeans_af_ctes(k=k, iterations=iterations, dim=dim)},
    cs AS (
      SELECT af.vec_id, af.cell,
             round(CASE WHEN {norm('af.embedding')} = 0.0
                          OR {norm(cf + '.c')} = 0.0 THEN 0.0
                        ELSE {dot('af.embedding', cf + '.c')}
                             / ({norm('af.embedding')} * {norm(cf + '.c')})
                   END, 6) AS c_sim,
             af.embedding AS v,
             {norm('af.embedding')} AS nrm
      FROM af JOIN {cf} ON af.cell = {cf}.cell
    ),
    ok_cells AS (
      SELECT cell FROM cs GROUP BY cell HAVING COUNT(*) <= {max_cell}
    ),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.c_sim AS ca, b.c_sim AS cb,
             round(CASE WHEN a.nrm = 0.0 OR b.nrm = 0.0 THEN 0.0
                        ELSE {dot('a.v', 'b.v')} / (a.nrm * b.nrm)
                   END, 6) AS sim
      FROM cs a JOIN cs b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN ok_cells ok ON a.cell = ok.cell
    ),
    d AS (
      SELECT DISTINCT CASE WHEN ca < cb THEN ib
                           WHEN cb < ca THEN ia
                           ELSE greatest(ia, ib) END AS vec_id
      FROM p WHERE sim >= {tau}
    )
    SELECT cs.vec_id, cs.cell, cs.c_sim,
           CASE WHEN d.vec_id IS NOT NULL THEN 'dropped' ELSE 'kept' END AS status
    FROM cs LEFT JOIN d USING (vec_id)
    """


@register(
    "d_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    tags=["dedup", "embedding", "semdedup"],
)
def d_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic deduplication (Abbas et al. 2023): k-means
    clusters from the portable Lloyd's trainer, then within-cell cosine
    pairs >= tau drop the member CLOSEST to its centroid (keep-farthest
    diversity rule; ties keep the smaller id). Oracle-checked end to end —
    trainer, assignment, centroid cosines, pairwise cosines, drop votes —
    via the shared k-means CTE chain. Scale: pair expansion only within a
    cell; k grows with corpus size so cells stay bounded (train on a
    sample, assign full-data)."""
    from datagouvfr_data_pipelines_spark.functions.similarity import (
        kmeans_fit,
        semantic_dedup,
    )

    emb = table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(
        emb,
        "embedding",
        k=_SEM_K,
        iterations=_SEM_ITERS,
        portable=True,
        init_id_col="vec_id",
    )
    return semantic_dedup(
        emb,
        "vec_id",
        "embedding",
        centroids,
        threshold=_SEM_TAU,
        max_cell_size=_SEM_MAX_CELL,
        # compute the per-vector fold block once (4 plan branches consume
        # it); bounded cache, cleared by clearCache() in long sessions
        persist_base=True,
    )


def _incremental_semantic_oracle(
    k: int = _SEM_K,
    iterations: int = _SEM_ITERS,
    dim: int = _SEM_DIM,
    tau: float = _SEM_TAU,
    max_cell: int = _SEM_MAX_CELL,
) -> str:
    """DuckDB replica of the incremental SemDeDup ingest decision
    (operators/incremental_semantic.py): the shared portable k-means CTE
    chain -> corpus/batch split by id hash -> corpus tier (cosine vs any
    indexed vector in the batch doc's cell, corpus cells over the cap
    skipped) -> batch tier (keep-farthest within-batch SemDeDup) ->
    reason precedence near_corpus > near_batch."""
    from datagouvfr_data_pipelines_spark.plans.text_pipeline import (
        _km_norm,
        _kmeans_af_ctes,
    )

    norm = _km_norm(dim)
    cf = f"c{iterations}"

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
            f"(acc, x) -> acc + x)"
        )

    def sim(a: str, b: str) -> str:
        return (
            f"round(CASE WHEN {a}.nrm = 0.0 OR {b}.nrm = 0.0 THEN 0.0 "
            f"ELSE {dot(a + '.v', b + '.v')} / ({a}.nrm * {b}.nrm) END, 6)"
        )

    return f"""
    {_kmeans_af_ctes(k=k, iterations=iterations, dim=dim)},
    cs AS (
      SELECT af.vec_id, af.cell,
             round(CASE WHEN {norm('af.embedding')} = 0.0
                          OR {norm(cf + '.c')} = 0.0 THEN 0.0
                        ELSE {dot('af.embedding', cf + '.c')}
                             / ({norm('af.embedding')} * {norm(cf + '.c')})
                   END, 6) AS c_sim,
             af.embedding AS v,
             {norm('af.embedding')} AS nrm
      FROM af JOIN {cf} ON af.cell = {cf}.cell
    ),
    corpus AS (SELECT * FROM cs WHERE vec_id % 4 <> 3),
    batch AS (SELECT * FROM cs WHERE vec_id % 4 = 3),
    ok_cc AS (
      SELECT cell FROM corpus GROUP BY cell HAVING COUNT(*) <= {max_cell}
    ),
    nc AS (
      SELECT DISTINCT b.vec_id
      FROM batch b
      JOIN ok_cc ok ON b.cell = ok.cell
      JOIN corpus c ON c.cell = b.cell
      WHERE {sim('c', 'b')} >= {tau}
    ),
    ok_bc AS (
      SELECT cell FROM batch GROUP BY cell HAVING COUNT(*) <= {max_cell}
    ),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.c_sim AS ca, b.c_sim AS cb,
             {sim('a', 'b')} AS sim
      FROM batch a JOIN batch b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN ok_bc ok ON a.cell = ok.cell
    ),
    nb AS (
      SELECT DISTINCT CASE WHEN ca < cb THEN ib
                           WHEN cb < ca THEN ia
                           ELSE greatest(ia, ib) END AS vec_id
      FROM p WHERE sim >= {tau}
    )
    SELECT b.vec_id, b.cell, b.c_sim,
           CASE WHEN b.vec_id IN (SELECT vec_id FROM nc) THEN 'near_corpus'
                WHEN b.vec_id IN (SELECT vec_id FROM nb) THEN 'near_batch'
                ELSE 'survived' END AS status
    FROM batch b
    """


@register(
    "d_incremental_semantic",
    oracle=_incremental_semantic_oracle(),
    tags=["dedup", "embedding", "semdedup", "incremental"],
)
def d_incremental_semantic(spark, sf_dir):
    """Incremental SemDeDup ingest decision: the embeddings table split
    corpus/batch by id hash, the corpus's per-vector semantic index built
    once, and every batch vector classified near_corpus (cosine >= tau vs
    ANY indexed vector of its cell — corpus precedence, oversized corpus
    cells skipped with the member kept) / near_batch (keep-farthest
    within-batch SemDeDup) / survived. Oracle-checked end to end through
    the shared portable k-means CTE chain. Scale: corpus side pruned by a
    broadcast of the batch's cells, pair stages salt-sliced; between
    batches the only state is the (doc, cell, vec, nrm, c_sim) index —
    ingest cost proportional to the batch, not the corpus."""
    from datagouvfr_data_pipelines_spark.functions.similarity import kmeans_fit
    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    emb = table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(
        emb,
        "embedding",
        k=_SEM_K,
        iterations=_SEM_ITERS,
        portable=True,
        init_id_col="vec_id",
    )
    corpus = emb.where(F.col("vec_id") % 4 != 3)
    batch = emb.where(F.col("vec_id") % 4 == 3)
    # persist both per-vector indexes (same policy as d_incremental_dedup's
    # corpus idx): the corpus index feeds two plan branches (cell-pruned
    # pair side + the cell-size cap) and the batch index five (corpus-tier
    # b side, its cell broadcast, the batch-tier SemDeDup base, the final
    # decision join) — unpersisted, the interpreted per-vector fold block
    # re-executes once per branch. The cached rows are the compact
    # (doc, cell, vec, nrm, c_sim) index itself — bounded state, reclaimed
    # by clearCache() in long-lived sessions.
    index = build_semantic_index(corpus, "vec_id", "embedding", centroids).persist()
    res = incremental_semantic_dedup(
        batch,
        index,
        "vec_id",
        "embedding",
        centroids,
        threshold=_SEM_TAU,
        max_cell_size=_SEM_MAX_CELL,
        persist=True,
    )
    # identical plan to the operator's internal batch index -> served from
    # the same cache entry (CacheManager matches canonicalized plans)
    decisions = build_semantic_index(batch, "vec_id", "embedding", centroids)
    return (
        decisions.join(res.ledger, "doc", "left")
        .select(
            F.col("doc").alias("vec_id"),
            "cell",
            "c_sim",
            F.coalesce(F.col("reason"), F.lit("survived")).alias("status"),
        )
    )
