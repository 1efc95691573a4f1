"""Training-data-pipeline catalog, batch 2: contrastive hard-negative
mining, tokenizer fertility analysis, temperature-scaled mixture weights,
and containment (quote-inclusion) near-dup search.

Same oracle discipline as text_pipeline.py: every float that reaches the
driver compare is either a ratio of exact integer sums, a single shared
IEEE expression (sqrt/÷/× are correctly rounded in both engines), or the
portable rolling-hash family — bit-identical to DuckDB by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.similarity import cosine
from datagouvfr_data_pipelines_spark.functions.text import (
    TOKEN_RE,
    token_count_bpe,
    token_count_ws,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table
from datagouvfr_data_pipelines_spark.plans.text_pipeline import (
    _DOT_SQL,
    _NORM_E_SQL,
    _NORM_P_SQL,
    _TOKENS_SQL,
    _minhash_neardup_oracle,
)


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH p AS (SELECT embedding AS p, label AS plabel
               FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({_DOT_SQL} / ({_NORM_E_SQL} * {_NORM_P_SQL}), 6) AS sim
    FROM embeddings e, p
    WHERE e.label <> p.plabel
    ORDER BY sim DESC, e.vec_id LIMIT 10
    """,
    tags=["similarity", "ann", "contrastive"],
)
def sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: the top-k vectors
    most similar to the anchor (vec_id=0) whose label DIFFERS from the
    anchor's — the in-batch-negative upgrade every embedding-model recipe
    uses. Same shuffle-free scan+TakeOrdered shape as sim_topk_cosine
    (anchor collected once driver-side, inlined as a literal); at fleet
    scale the anchor batch goes through sim_knn_join's broadcast path."""
    emb = table(spark, sf_dir, "embeddings")
    anchor = (
        emb.where(F.col("vec_id") == 0).select("embedding", "label").head()
    )
    p = F.array(*[F.lit(float(v)) for v in anchor["embedding"]])
    out = emb.where(F.col("label") != F.lit(anchor["label"])).select(
        "vec_id",
        "label",
        F.round(cosine("embedding", p), 6).alias("sim"),
    )
    return out.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(10)


@register(
    "t_fertility_stats",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len({_TOKENS_SQL}) END AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS bpe,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS tok_ws,
           CAST(SUM(bpe) AS BIGINT) AS tok_bpe,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST(SUM(chars) AS DOUBLE) / greatest(SUM(ws), 1) AS chars_per_token,
           CAST(SUM(bpe) AS DOUBLE) / greatest(SUM(ws), 1) AS fertility
    FROM t GROUP BY lang
    """,
    tags=["text", "tokenizer", "fertility"],
)
def t_fertility_stats(spark, sf_dir):
    """Tokenizer fertility per language: chars-per-whitespace-token and
    BPE-ish-tokens-per-whitespace-token — the standard check that a
    tokenizer doesn't tax some languages with more subwords per word
    (fertility skews both cost and mixture math). Exact bigint sums,
    one partial-aggregated shuffle on lang; ratios are single shared
    IEEE divisions, bit-identical cross-engine."""
    docs = table(spark, sf_dir, "documents")
    ws = token_count_ws("text").cast("bigint")
    bpe = token_count_bpe("text").cast("bigint")
    chars = F.length("text").cast("bigint")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("tok_ws"),
        F.sum(bpe).alias("tok_bpe"),
        F.sum(chars).alias("n_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "tok_ws",
        "tok_bpe",
        "n_chars",
        (
            F.col("n_chars").cast("double")
            / F.greatest(F.col("tok_ws"), F.lit(1))
        ).alias("chars_per_token"),
        (
            F.col("tok_bpe").cast("double")
            / F.greatest(F.col("tok_ws"), F.lit(1))
        ).alias("fertility"),
    )


_MIX_BUDGET = 1_000_000


@register(
    "asm_temperature_mixture",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len({_TOKENS_SQL}) END) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    q AS (
      SELECT lang, n_tokens,
             CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000000) AS BIGINT)
               AS qs
      FROM per
    ),
    tot AS (SELECT CAST(SUM(qs) AS BIGINT) AS qtot FROM q)
    SELECT lang, n_tokens,
           CAST(qs AS DOUBLE) / CAST(qtot AS DOUBLE) AS weight,
           CAST(FLOOR((CAST(qs AS DOUBLE) / CAST(qtot AS DOUBLE))
                      * {_MIX_BUDGET}) AS BIGINT) AS budget_tokens
    FROM q, tot
    """,
    tags=["assembly", "mixture", "temperature"],
)
def asm_temperature_mixture(spark, sf_dir):
    """Temperature-scaled language mixture (alpha=0.5): sampling weights
    proportional to sqrt(corpus tokens) — the multilingual rebalancing
    rule (upsample tails, downsample heads) used by every public
    multilingual pretraining recipe. One shuffle on lang; the 1-row
    sqrt-sum total broadcasts back (INTENDED_CARTESIAN). Portability:
    sqrt and ÷ are IEEE-correctly-rounded everywhere; the sqrt values are
    nano-floor-quantized to bigints BEFORE summing so the denominator is
    an exact integer under any partition/summation order."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.sum(token_count_ws("text").cast("bigint")).alias("n_tokens")
    )
    q = per.select(
        "lang",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1e9)
        .cast("bigint")
        .alias("qs"),
    )
    tot = q.agg(F.sum("qs").cast("bigint").alias("qtot"))
    w = F.col("qs").cast("double") / F.col("qtot").cast("double")
    return q.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        w.alias("weight"),
        F.floor(w * _MIX_BUDGET).cast("bigint").alias("budget_tokens"),
    )


def _containment_oracle(
    threshold: float = 0.6, cap: int = 64, min_shared: int = 2
) -> str:
    """DuckDB replica of the shared-shingle containment search: rolling
    shingle hashes -> capped inverted index -> bucket pairs with a
    shared-count floor -> exact containment verify (|A∩B|/min(|A|,|B|))."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM t
    ), h AS (
      SELECT doc_id, list_distinct(list_transform(sh, sg -> list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(sg, ''), c -> CAST(ascii(c) AS BIGINT))),
          (acc, x) -> (acc * 131 + x) % 2147483647))) AS hs
      FROM s
    ), inv AS (
      SELECT doc_id, unnest(hs) AS sh_h FROM h
    ), buckets AS (
      SELECT sh_h FROM inv GROUP BY sh_h
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets k
      JOIN inv a ON a.sh_h = k.sh_h
      JOIN inv b ON b.sh_h = k.sh_h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= {min_shared}
    )
    SELECT * FROM (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
             / CAST(least(len(ha.hs), len(hb.hs)) AS DOUBLE) AS containment
      FROM cand c
      JOIN h ha ON ha.doc_id = c.id_a
      JOIN h hb ON hb.doc_id = c.id_b
    ) WHERE containment >= {threshold}
    """


@register(
    "d_containment_pairs",
    oracle=_containment_oracle(),
    tags=["dedup", "containment"],
)
def d_containment_pairs(spark, sf_dir):
    """Quote-inclusion near-dup search: CONTAINMENT |A∩B|/min(|A|,|B|)
    over shared-rare-shingle candidates — catches a short document
    embedded inside a long one (boilerplate wrappers, quoted articles).
    Deliberately NOT MinHash LSH: band collisions happen with probability
    Jaccard^rows and contained pairs have low Jaccard by construction, so
    LSH never surfaces them (pinned by
    tests/test_round4_batch2.py::test_containment_catches_subset_jaccard_misses);
    the inverted shingle index with a frequency cap is the
    Broder/LSH-Ensemble answer
    (operators/dedup.py:shingle_containment_pairs)."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        shingle_containment_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    return shingle_containment_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.6,
        broadcast_candidates=True, portable=True,
    )


_CELL_SQL = """CAST(32 * (embedding[1] >= 0)::INT + 16 * (embedding[2] >= 0)::INT
         + 8 * (embedding[3] >= 0)::INT + 4 * (embedding[4] >= 0)::INT
         + 2 * (embedding[5] >= 0)::INT + (embedding[6] >= 0)::INT AS INTEGER)"""


@register(
    "sim_ivf_recall",
    oracle=f"""
    WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    pcell AS (SELECT {_CELL_SQL} AS cell FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id, {_CELL_SQL} AS cell,
             round({_DOT_SQL} / ({_NORM_E_SQL} * {_NORM_P_SQL}), 6) AS sim
      FROM embeddings e, p
    ),
    exact10 AS (SELECT vec_id FROM sims ORDER BY sim DESC, vec_id LIMIT 10),
    approx10 AS (
      SELECT vec_id FROM sims WHERE cell = (SELECT cell FROM pcell)
      ORDER BY sim DESC, vec_id LIMIT 10
    )
    SELECT CAST((SELECT COUNT(*) FROM approx10) AS BIGINT) AS n_approx,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_10
    FROM exact10 JOIN approx10 USING (vec_id)
    """,
    tags=["similarity", "ann", "evaluation"],
)
def sim_ivf_recall(spark, sf_dir):
    """ANN quality measurement: recall@10 of the sign-bit IVF cell
    restriction against brute-force cosine for the anchor vector — the
    evaluation loop every ANN deployment runs before trading exactness
    for speed. Both rankings share one scan's bit-identical similarity
    column, so the overlap count (and thus recall) is engine-exact.
    Scale: two TakeOrdered passes over the same projection; the join is
    10x10 ids."""
    emb = table(spark, sf_dir, "embeddings")
    from datagouvfr_data_pipelines_spark.functions.similarity import ivf_cell

    anchor = emb.where(F.col("vec_id") == 0).head()["embedding"]
    p = F.array(*[F.lit(float(v)) for v in anchor])
    bits = [1 if float(anchor[i]) >= 0 else 0 for i in range(6)]
    anchor_cell = int("".join(map(str, bits)), 2)
    sims = emb.select(
        "vec_id",
        ivf_cell("embedding", 64).alias("cell"),
        F.round(cosine("embedding", p), 6).alias("sim"),
    )
    exact10 = (
        sims.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    approx10 = (
        sims.where(F.col("cell") == anchor_cell)
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    n_approx = approx10.count()
    return (
        exact10.join(approx10, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(n_approx).cast("bigint").alias("n_approx"),
            F.col("n_overlap").cast("bigint"),
            (F.col("n_overlap").cast("double") / 10.0).alias("recall_at_10"),
        )
    )


@register(
    "sim_ivf_nprobe_sweep",
    oracle=f"""
    WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    pcell AS (SELECT {_CELL_SQL} AS cell FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id, {_CELL_SQL} AS cell,
             round({_DOT_SQL} / ({_NORM_E_SQL} * {_NORM_P_SQL}), 6) AS sim
      FROM embeddings e, p
    ),
    exact10 AS (SELECT vec_id FROM sims ORDER BY sim DESC, vec_id LIMIT 10),
    ranked_cells AS (
      SELECT g.c AS cell,
             ROW_NUMBER() OVER (ORDER BY bit_count(xor(g.c, pc.cell)), g.c)
               AS rk
      FROM generate_series(0, 63) g(c), pcell pc
    ),
    probes(nprobe) AS (VALUES (1), (2), (4)),
    approx AS (
      SELECT pr.nprobe, s.vec_id,
             ROW_NUMBER() OVER (PARTITION BY pr.nprobe
                                ORDER BY s.sim DESC, s.vec_id) AS rn
      FROM probes pr
      JOIN ranked_cells rc ON rc.rk <= pr.nprobe
      JOIN sims s ON s.cell = rc.cell
    )
    SELECT CAST(a.nprobe AS INT) AS nprobe,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(e.vec_id) AS DOUBLE) / 10.0 AS recall_at_10
    FROM (SELECT nprobe, vec_id FROM approx WHERE rn <= 10) a
    LEFT JOIN exact10 e USING (vec_id)
    GROUP BY a.nprobe
    """,
    tags=["similarity", "ann", "evaluation"],
)
def sim_ivf_nprobe_sweep(spark, sf_dir):
    """The IVF recall/cost dial, measured: recall@10 of the sign-bit cell
    restriction at nprobe IN (1, 2, 4) probe cells, ranked by Hamming
    distance of the 6-bit sign pattern (ties to the lower cell id). The
    candidate set at nprobe=m is a subset of the set at any m' > m, so
    recall@10 is provably nondecreasing in nprobe (pinned in
    tests/test_round9.py) — the curve an ANN deployment reads to pick its
    operating point. Scale: the cell ranking is 64 constant integers
    (driver-side arithmetic, no data access); each sweep point is one
    cell-pruned scan + TakeOrdered, cost ~ nprobe/64 of the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    from datagouvfr_data_pipelines_spark.functions.similarity import ivf_cell

    anchor = emb.where(F.col("vec_id") == 0).head()["embedding"]
    p = F.array(*[F.lit(float(v)) for v in anchor])
    pcell = int(
        "".join("1" if float(anchor[i]) >= 0 else "0" for i in range(6)), 2
    )
    ranked = sorted(range(64), key=lambda c: (bin(c ^ pcell).count("1"), c))
    sims = emb.select(
        "vec_id",
        ivf_cell("embedding", 64).alias("cell"),
        F.round(cosine("embedding", p), 6).alias("sim"),
    )
    exact10 = (
        sims.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    out = None
    for nprobe in (1, 2, 4):
        approx10 = (
            sims.where(F.col("cell").isin(ranked[:nprobe]))
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(10)
            .select("vec_id")
        )
        one = (
            exact10.join(approx10, "vec_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .select(
                F.lit(nprobe).cast("int").alias("nprobe"),
                F.col("n_overlap").cast("bigint").alias("n_overlap"),
                (F.col("n_overlap").cast("double") / 10.0).alias(
                    "recall_at_10"
                ),
            )
        )
        out = one if out is None else out.unionByName(one)
    return out


_ZIPF_TOP = 100


@register(
    "t_zipf_slope",
    oracle=f"""
    WITH tk AS (
      SELECT lang, unnest({_TOKENS_SQL}) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ),
    freq AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM tk WHERE length(tok) > 0 GROUP BY lang, tok
    ),
    ranked AS (
      SELECT lang, f,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, tok ASC)
               AS r
      FROM freq
    ),
    pts AS (
      SELECT lang,
             CAST(FLOOR(ln(r) * 1000000000) AS BIGINT) AS qx,
             CAST(FLOOR(ln(f) * 1000000000) AS BIGINT) AS qy,
             CAST(FLOOR(ln(r) * ln(f) * 1000000000) AS BIGINT) AS qxy,
             CAST(FLOOR(ln(r) * ln(r) * 1000000000) AS BIGINT) AS qxx
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ),
    s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
             CAST(SUM(qxy) AS BIGINT) AS sxy, CAST(SUM(qxx) AS BIGINT) AS sxx
      FROM pts GROUP BY lang
    )
    SELECT lang, n,
           ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000000))
            - ((CAST(sx AS DOUBLE) / 1000000000)
               * (CAST(sy AS DOUBLE) / 1000000000)))
           / ((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1000000000))
              - ((CAST(sx AS DOUBLE) / 1000000000)
                 * (CAST(sx AS DOUBLE) / 1000000000))) AS zipf_slope
    FROM s
    """,
    tags=["text", "corpus-stats", "zipf"],
)
def t_zipf_slope(spark, sf_dir):
    """Zipf exponent per language: least-squares slope of ln(freq) vs
    ln(rank) over the top-100 tokens — the classic corpus-health check
    (natural text ~ -1; boilerplate or spam bends the curve). ln runs on
    INTEGER rank/frequency inputs (bit-identical across engines, the
    t_tfidf_weights precedent); each regression term is ONE IEEE product
    nano-floor-quantized to a bigint BEFORE summing, so the per-lang sums
    are exact integers and the closing slope expression is a fixed IEEE
    tree on identical inputs. Plan: explode -> (lang, tok) count (one
    map-combined shuffle), lang-partitioned rank window, 100-row-per-lang
    regression aggregate."""
    docs = table(spark, sf_dir, "documents")
    from datagouvfr_data_pipelines_spark.functions.text import tokens
    from datagouvfr_data_pipelines_spark.operators.aggregates import (
        grouped_top_k,
    )

    tk = docs.where(F.length(F.trim("text")) > 0).select(
        "lang", F.explode(tokens("text")).alias("tok")
    )
    freq = (
        tk.where(F.length("tok") > 0)
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # skew-safe top-100: a plain lang-partitioned rank window would drag
    # the FULL per-lang vocabulary (|vocab| rows at corpus scale) through
    # one reducer; the salted two-stage top-k prunes to fan x 100 first
    ranked = grouped_top_k(
        freq,
        ["lang"],
        [F.col("f").desc(), F.col("tok").asc()],
        _ZIPF_TOP,
        tiebreak_col="tok",
        rank_alias="r",
    )
    lnr = F.log(F.col("r").cast("double"))
    lnf = F.log(F.col("f").cast("double"))
    q = lambda c: F.floor(c * 1e9).cast("bigint")  # noqa: E731
    s = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q(lnr)).alias("sx"),
        F.sum(q(lnf)).alias("sy"),
        F.sum(q(lnr * lnf)).alias("sxy"),
        F.sum(q(lnr * lnr)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    dx = F.col("sx").cast("double") / 1e9
    dy = F.col("sy").cast("double") / 1e9
    dxy = F.col("sxy").cast("double") / 1e9
    dxx = F.col("sxx").cast("double") / 1e9
    return s.select(
        "lang",
        "n",
        ((nd * dxy - dx * dy) / (nd * dxx - dx * dx)).alias("zipf_slope"),
    )


@register(
    "d_dup_source_matrix",
    oracle=f"""
    SELECT da.source AS source_a, db.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM ({_minhash_neardup_oracle()}) p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY 1, 2
    """,
    tags=["dedup", "provenance"],
)
def d_dup_source_matrix(spark, sf_dir):
    """Cross-source duplication attribution: near-dup pairs rolled up by
    (source_a, source_b) — which feed copies which, the provenance signal
    that decides whether to drop a whole source or just its duplicates.
    The verified pair set is tiny relative to the corpus, so it (and its
    once-enriched successor) BROADCASTS into the two document-side
    enrichment joins — the corpus is never shuffled; everything upstream
    is the oracle-checked portable MinHash pipeline (d_minhash_neardups)."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        near_duplicate_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = near_duplicate_pairs(
        docs, "doc_id", "text", k=64, bands=8, shingle_n=3, threshold=0.5,
        broadcast_candidates=True, portable=True,
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    e1 = src.withColumnsRenamed(
        {"doc_id": "id_a", "source": "source_a"}
    ).join(F.broadcast(pairs), "id_a")
    e2 = src.withColumnsRenamed(
        {"doc_id": "id_b", "source": "source_b"}
    ).join(F.broadcast(e1), "id_b")
    return e2.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@register(
    "d_cluster_size_hist",
    oracle=f"""
    WITH RECURSIVE pr AS (
      SELECT id_a, id_b FROM ({_minhash_neardup_oracle()})
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pr
      UNION ALL SELECT id_b, id_a FROM pr
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
      UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node, CAST(MIN(lbl) AS BIGINT) AS component
      FROM reach GROUP BY node
    ),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    tags=["dedup", "clusters"],
)
def d_cluster_size_hist(spark, sf_dir):
    """Near-dup cluster-size distribution: LSH-verified pairs collapse to
    components (large-star/small-star, operators/graph.py) and the
    histogram reports how duplication mass is shaped — a few giant
    boilerplate clusters vs many twins decide whether to fix extraction
    or just dedup. The oracle replicates the component collapse with a
    recursive min-label reachability CTE (== the star-contraction
    minimum, the corpus_curation precedent)."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        near_duplicate_pairs,
    )
    from datagouvfr_data_pipelines_spark.operators.graph import (
        connected_components,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = near_duplicate_pairs(
        docs, "doc_id", "text", k=64, bands=8, shingle_n=3, threshold=0.5,
        broadcast_candidates=True, portable=True,
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
    )


@register(
    "emb_dim_stats",
    oracle="""
    WITH v AS (
      SELECT i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings e
      CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) i
    ),
    q AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(x * 1000000000) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(FLOOR(x * x * 1000000000) AS BIGINT)) AS BIGINT) AS s2,
             MIN(x) AS mn, MAX(x) AS mx
      FROM v GROUP BY dim
    )
    SELECT CAST(dim AS INTEGER) AS dim, n,
           (CAST(s1 AS DOUBLE) / 1000000000) / n AS mean,
           (CAST(s2 AS DOUBLE) / 1000000000) / n
             - ((CAST(s1 AS DOUBLE) / 1000000000) / n)
               * ((CAST(s1 AS DOUBLE) / 1000000000) / n) AS variance,
           mn AS min_x, mx AS max_x
    FROM q
    """,
    tags=["similarity", "monitoring", "drift"],
)
def emb_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (mean/variance/min/max) — the
    drift monitor every vector pipeline runs between model versions: a
    shifted mean or collapsed variance in one dimension flags a bad
    encoder rollout before ANN recall degrades. posexplode -> one
    partial-aggregated shuffle on the (tiny) dim key; moments come from
    nano-floor-quantized integer sums so mean and variance are
    bit-identical cross-engine."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.posexplode("embedding").alias("pos", "xf")
    ).select((F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
    q = lambda c: F.sum(F.floor(c * 1e9).cast("bigint")).cast("bigint")  # noqa: E731
    g = v.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        q(F.col("x")).alias("s1"),
        q(F.col("x") * F.col("x")).alias("s2"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )
    mean = (F.col("s1").cast("double") / 1e9) / F.col("n")
    return g.select(
        F.col("dim").cast("int"),
        "n",
        mean.alias("mean"),
        ((F.col("s2").cast("double") / 1e9) / F.col("n") - mean * mean).alias(
            "variance"
        ),
        "min_x",
        "max_x",
    )


_SHA_SQL = ("sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))")
_PUNCT_SQL = (
    "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
    " / greatest(length(text), 1)"
)
_STOPR_SQL = (
    f"CAST(len(list_filter({_TOKENS_SQL}, t -> list_contains("
    "['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'on', 'for'], t)))"
    f" AS DOUBLE) / greatest(len({_TOKENS_SQL}), 1)"
)
_QUALITY_SQL = f"""(CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
      + CASE WHEN {_PUNCT_SQL} <= 0.2 THEN 1.0 ELSE 0.0 END
      + CASE WHEN {_STOPR_SQL} BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END) / 3.0"""


@register(
    "asm_dataset_card",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len({_TOKENS_SQL}) END) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           1.0 - CAST(COUNT(DISTINCT {_SHA_SQL}) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
           CAST(SUM(CASE WHEN {_QUALITY_SQL} >= 0.99 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS quality_pass_rate,
           quantile_cont(length(text), 0.5) AS median_chars
    FROM documents
    """,
    tags=["assembly", "reporting", "dataset-card"],
)
def asm_dataset_card(spark, sf_dir):
    """One-row dataset card — the datasheet a corpus release ships with:
    volume (docs/tokens/chars), diversity (langs/sources), hygiene
    (exact-dup rate via the normalized sha256, heuristic quality pass
    rate) and the median document length. ONE pass over the corpus: a
    single global aggregate (partial-combined; the distinct counts
    expand map-side), no joins. Composes the card from already
    oracle-checked building blocks (d2 dup-rate, t_quality_scores gate,
    a2 exact-median policy)."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        quality_score,
        token_count_ws,
    )
    from datagouvfr_data_pipelines_spark.operators.dedup import content_hash

    docs = table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return docs.agg(
        n.cast("bigint").alias("n_docs"),
        F.sum(token_count_ws("text").cast("bigint")).alias("n_tokens"),
        F.sum(F.length("text").cast("bigint")).alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        (
            F.lit(1.0)
            - F.countDistinct(content_hash("text")).cast("double")
            / n.cast("double")
        ).alias("dup_rate"),
        (
            F.sum(
                F.when(quality_score("text") >= 0.99, 1).otherwise(0)
            ).cast("double")
            / n.cast("double")
        ).alias("quality_pass_rate"),
        F.percentile(F.length("text"), F.lit(0.5)).alias("median_chars"),
    )


def _langid_pred_sql() -> str:
    from datagouvfr_data_pipelines_spark.plans.text_pipeline import _marker_sql

    de = _marker_sql("de", ["der", "die", "und", "das", "ist"])
    en = _marker_sql("en", ["the", "and", "of", "to", "is"])
    es = _marker_sql("es", ["el", "los", "que", "de", "y"])
    fr = _marker_sql("fr", ["le", "la", "les", "et", "des"])
    return f"""
      SELECT doc_id, lang,
             CASE WHEN greatest({de}, {en}, {es}, {fr}) = 0 THEN 'und'
                  WHEN {de} = greatest({de}, {en}, {es}, {fr}) THEN 'de'
                  WHEN {en} = greatest({de}, {en}, {es}, {fr}) THEN 'en'
                  WHEN {es} = greatest({de}, {en}, {es}, {fr}) THEN 'es'
                  ELSE 'fr' END AS lang_pred
      FROM documents"""


@register(
    "t_langid_confusion",
    oracle=f"""
    WITH p AS ({_langid_pred_sql()}),
    n AS (SELECT COUNT(*) AS total FROM p)
    SELECT lang AS lang_true, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS row_accuracy
    FROM p GROUP BY lang, lang_pred
    """,
    tags=["text", "lang-id", "evaluation"],
)
def t_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: declared label x heuristic
    prediction with per-cell counts and row accuracy — the evaluation
    every classifier swap runs before shipping (which languages leak
    into which). One scan + a tiny |langs|^2 aggregate; the prediction
    is the oracle-checked t_lang_id marker heuristic."""
    from datagouvfr_data_pipelines_spark.functions.text import lang_id

    docs = table(spark, sf_dir, "documents")
    p = docs.select(
        F.col("lang").alias("lang_true"), lang_id("text").alias("lang_pred")
    )
    return p.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(
                F.when(F.col("lang_true") == F.col("lang_pred"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("row_accuracy"),
    )


@register(
    "t_ngram_novelty",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM t
    ), inv AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), freq AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM inv GROUP BY g
    )
    SELECT i.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
    FROM inv i JOIN freq f ON f.g = i.g
    GROUP BY i.doc_id
    """,
    tags=["text", "novelty", "boilerplate"],
)
def t_ngram_novelty(spark, sf_dir):
    """Corpus n-gram novelty per document: the fraction of a document's
    distinct 3-gram shingles that appear in NO other document — the
    inverse-boilerplate signal (low novelty = template/wrapper text,
    complementary to within-doc repetition and cross-doc dup-span).
    Two map-combined shuffles: shingle-keyed doc-frequency, then the
    doc-keyed ratio aggregate; the shingle join carries only (hash, df).
    Distinct word shingles stay as STRINGS here (df must count exact
    grams); the hashed variant rides shingle_containment_pairs when the
    fingerprint width matters at scale."""
    from datagouvfr_data_pipelines_spark.functions.text import word_shingles

    docs = table(spark, sf_dir, "documents")
    inv = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles("text", 3))
        ).alias("g"),
    )
    freq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        inv.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
            (
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty_frac"),
        )
    )


@register(
    "w26_ema_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT list(day ORDER BY day) AS days,
             list(revenue ORDER BY day) AS vs
      FROM daily
    )
    SELECT days[t.t] AS day, vs[t.t] AS revenue,
           list_reduce(vs[1:t.t], (acc, x) -> (acc + x) / 2) AS ema
    FROM s CROSS JOIN LATERAL (
      SELECT unnest(generate_series(1, len(vs))) AS t
    ) t
    """,
    tags=["window", "timeseries", "ema"],
)
def w26_ema_daily_revenue(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue
    (alpha = 1/2): e_t = (v_t + e_{t-1})/2 — the trend-smoothing signal
    behind anomaly thresholds. Portability is structural: every step
    divides by 2 (exact dyadic scaling) over decimal-exact daily sums,
    so each prefix fold is bit-identical cross-engine with NO
    quantization. The |days| axis is bounded (the w12/w21 argument), so
    the sorted day list collapses to ONE row and the per-day prefix
    folds run as JVM higher-order expressions — no window, no cross
    join, no shuffle beyond the daily aggregate. Scale note: the EMA
    recurrence is an affine map e -> (e + v)/2, and affine composition
    is associative — the segmented (a, b)-pair aggregation parallelizes
    it if |days| ever stopped being bounded."""
    orders = table(spark, sf_dir, "orders")
    from datagouvfr_data_pipelines_spark.operators.aggregates import dsum

    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(dsum("o_totalprice", "revenue"))
    one = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "revenue"))).alias("s")
    )
    vs = F.transform(F.col("s"), lambda e: e["revenue"])
    ema_t = lambda t: F.aggregate(  # noqa: E731
        F.slice(vs, F.lit(2).cast("int"), (t - 1).cast("int")),
        F.element_at(vs, F.lit(1)),
        lambda acc, x: (acc + x) / 2,
    )
    return one.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s")),
                lambda t: F.struct(
                    F.element_at(F.col("s"), t)["day"].alias("day"),
                    F.element_at(F.col("s"), t)["revenue"].alias("revenue"),
                    ema_t(t).alias("ema"),
                ),
            )
        ).alias("r")
    ).select("r.day", "r.revenue", "r.ema")


@register(
    "a39_gini_revenue",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
      FROM rev
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS t,
             SUM(CAST(i AS HUGEINT) * cents) AS s
      FROM r
    )
    SELECT n,
           2.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM s
    """,
    tags=["aggregation", "inequality", "gini"],
)
def a39_gini_revenue(spark, sf_dir):
    """Gini coefficient of customer revenue concentration — the
    inequality scalar behind 'top X% of customers drive Y%' analyses
    (the ABC/Pareto family, reduced to one number). Exact: integer-cent
    revenues, DISTRIBUTED global ranking via global_dense_ids (range
    shuffle + K-row offset table — never a full single-partition sort;
    hence the INTENDED_GLOBAL_WINDOW whitelist entry for the K-row
    offsets frame), rank-weighted sums in decimal (HUGEINT in the
    oracle), and one shared closing IEEE expression
    2S/(nT) - (n+1)/n."""
    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_dense_ids,
    )

    orders = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    rev = orders.groupBy("o_custkey").agg(
        (F.sum(dec) * 100).cast("bigint").alias("cents")
    )
    ranked = global_dense_ids(rev, ["cents", "o_custkey"], alias="i")
    d38 = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("t"),
        F.sum(F.col("i").cast(d38) * F.col("cents").cast(d38)).alias("s"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        (
            F.lit(2.0) * F.col("s").cast("double")
            / (nd * F.col("t").cast("double"))
            - (nd + F.lit(1.0)) / nd
        ).alias("gini"),
    )


@register(
    "e_bounce_rate",
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id, ts,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_us
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > 1800000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_n
      FROM lagged
    ),
    per AS (
      SELECT user_id, session_n, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, session_n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
           CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS events_per_session
    FROM per
    """,
    tags=["events", "sessions", "engagement"],
)
def e_bounce_rate(spark, sf_dir):
    """Bounce rate + session depth: fraction of 30-min-gap sessions with
    exactly one event, and mean events per session — the two engagement
    scalars every web-analytics report opens with. Sessionization (W1
    operator, user-partitioned windows only) -> per-session counts ->
    one partial-combined global aggregate."""
    from datagouvfr_data_pipelines_spark.operators.windows import session_ids

    ev = table(spark, sf_dir, "events")
    s = session_ids(ev, "user_id", "ts", 1800, tiebreak_cols=["event_id"])
    per = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    n = F.count(F.lit(1))
    b = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per.agg(
        n.cast("bigint").alias("n_sessions"),
        b.cast("bigint").alias("n_bounces"),
        (b.cast("double") / n.cast("double")).alias("bounce_rate"),
        (
            F.sum("n_events").cast("double") / n.cast("double")
        ).alias("events_per_session"),
    )


@register(
    "scalar_siren_luhn",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             lpad(CAST(o_orderkey % 1000000000 AS VARCHAR), 9, '0') AS siren
      FROM orders WHERE o_orderkey < 4000
    )
    SELECT o_orderkey, siren,
           CAST(list_sum(list_transform(generate_series(1, 9), i ->
             CASE WHEN (9 - i) % 2 = 1
                  THEN CASE WHEN CAST(siren[i] AS INTEGER) * 2 > 9
                            THEN CAST(siren[i] AS INTEGER) * 2 - 9
                            ELSE CAST(siren[i] AS INTEGER) * 2 END
                  ELSE CAST(siren[i] AS INTEGER) END)) % 10 = 0
             AS INTEGER) AS luhn_valid
    FROM s
    """,
    tags=["scalar", "validation", "siren"],
)
def scalar_siren_luhn(spark, sf_dir):
    """SIREN Luhn-checksum validation — the identifier-integrity gate
    French open-data pipelines apply to every SIREN/SIRET column
    (reference: schema/utils consolidation validates business ids before
    joining registries). Pure integer column arithmetic over the padded
    digit string (double every second digit from the right, fold mod
    10) — no UDF, shuffle-free; the synthetic SIREN derives from
    o_orderkey so the check is reproducible on the test tables."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 4000)
    siren = F.lpad(
        (F.col("o_orderkey") % 1_000_000_000).cast("string"), 9, "0"
    )
    d = lambda i: F.substring(F.col("siren"), i, 1).cast("int")  # noqa: E731

    def term(i):
        doubled = d(i) * 2
        return F.when(
            F.lit((9 - i) % 2 == 1),
            F.when(doubled > 9, doubled - 9).otherwise(doubled),
        ).otherwise(d(i))

    total = term(1)
    for i in range(2, 10):
        total = total + term(i)
    return orders.select("o_orderkey", siren.alias("siren")).select(
        "o_orderkey",
        "siren",
        ((total % 10) == 0).cast("int").alias("luhn_valid"),
    )


@register(
    "w27_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT list(day ORDER BY day) AS days,
             list(v ORDER BY day) AS vs,
             CAST(SUM(CAST(v * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS tot,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(v * 100 AS DECIMAL(38,0))
                      * CAST(v * 100 AS DECIMAL(38,0))) AS DOUBLE) / 10000
               AS sq
      FROM daily
    ),
    p AS (
      SELECT days, vs, n,
             tot / n AS mu,
             sqrt(sq / n - (tot / n) * (tot / n)) AS sigma
      FROM s
    )
    SELECT days[t.t] AS day, vs[t.t] AS revenue,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vs[1:t.t]),
             (acc, x) -> greatest(0.0, acc + (x - mu - 0.5 * sigma)))
             AS cusum,
           CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vs[1:t.t]),
             (acc, x) -> greatest(0.0, acc + (x - mu - 0.5 * sigma)))
             > 4.0 * sigma AS INTEGER) AS is_alarm
    FROM p CROSS JOIN LATERAL (
      SELECT unnest(generate_series(1, CAST(n AS INTEGER))) AS t
    ) t
    """,
    tags=["window", "timeseries", "cusum", "drift"],
)
def w27_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detector over daily revenue: s_t =
    max(0, s_{t-1} + (v_t - mu - k)) with slack k = sigma/2 and alarm at
    4*sigma — the classic sequential change-point monitor for pipeline
    output volume. Portability: mu/sigma come from decimal-exact
    centi-unit sums closed by shared IEEE expressions (sqrt is
    correctly rounded), and the fold itself is only +,-,max — exact.
    Same bounded-|days| one-row fold shape as w26 (no window, no
    shuffle beyond the daily aggregate); the max-fold is NOT affine so
    the sequential form is the honest one — at unbounded scale CUSUM is
    the canonical stateful-streaming op (streaming/stateful.py)."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
        ).alias("v")
    )
    cu = F.col("v") * 100
    one = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("s"),
        (F.sum(cu.cast("decimal(38,0)")).cast("double") / 100).alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(cu.cast("decimal(38,0)") * cu.cast("decimal(38,0)"))
            .cast("double")
            / 10000
        ).alias("sq"),
    )
    mu = (F.col("tot") / F.col("n")).alias("mu")
    sigma = F.sqrt(
        F.col("sq") / F.col("n")
        - (F.col("tot") / F.col("n")) * (F.col("tot") / F.col("n"))
    )
    p = one.select("s", "n", mu, sigma.alias("sigma"))
    vs = F.transform(F.col("s"), lambda e: e["v"])
    fold = lambda t: F.aggregate(  # noqa: E731
        F.slice(vs, F.lit(1).cast("int"), t.cast("int")),
        F.lit(0.0),
        lambda acc, x: F.greatest(
            F.lit(0.0), acc + (x - F.col("mu") - F.lit(0.5) * F.col("sigma"))
        ),
    )
    return p.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n").cast("int")),
                lambda t: F.struct(
                    F.element_at(F.col("s"), t)["day"].alias("day"),
                    F.element_at(F.col("s"), t)["v"].alias("revenue"),
                    fold(t).alias("cusum"),
                    (fold(t) > F.lit(4.0) * F.col("sigma"))
                    .cast("int")
                    .alias("is_alarm"),
                ),
            )
        ).alias("r")
    ).select("r.day", "r.revenue", "r.cusum", "r.is_alarm")


_ILV_HASH = ("(((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647"
             " * 784588716 + 997) % 2147483647")


@register(
    "asm_interleave_stream",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, {_ILV_HASH} AS hh FROM documents
    ),
    src AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS source_idx,
             CAST(COUNT(*) AS BIGINT) AS n_in_source
      FROM h GROUP BY source
    ),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM src),
    r AS (
      SELECT doc_id, source, hh,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY hh, doc_id
             ) AS rank_in_source
      FROM h
    )
    SELECT r.doc_id, r.source,
           CAST(r.rank_in_source AS BIGINT) AS rank_in_source,
           CAST((r.rank_in_source - 1) * ns.n_sources + s.source_idx
                AS BIGINT) AS stream_pos
    FROM r JOIN src s ON s.source = r.source CROSS JOIN ns
    """,
    tags=["assembly", "ordering", "interleave"],
)
def asm_interleave_stream(spark, sf_dir):
    """Deterministic round-robin training-stream order: documents are
    hash-shuffled WITHIN each source (the LCG portable hash as the
    deterministic seed) and sources interleave position-by-position —
    stream_pos = (rank_in_source - 1) * n_sources + source_idx — so a
    sequential reader sees sources evenly mixed from step one (the
    anti-curriculum every pretraining dataloader wants) with zero RNG
    state. Distributed ranking: global_dense_ids over (source, hash)
    gives a GLOBAL rank on a range shuffle — never a per-source
    single-reducer window — and the rank within each source is that
    global rank minus a broadcast per-source offset (prefix counts over
    the tiny |sources| frame)."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        portable_id_hash,
    )
    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_dense_ids,
    )
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", portable_id_hash("doc_id").alias("hh")
    )
    ranked = global_dense_ids(h, ["source", "hh", "doc_id"], alias="g")
    src = h.groupBy("source").agg(F.count(F.lit(1)).alias("n_in_source"))
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    src = src.select(
        "source",
        (F.row_number().over(Window.orderBy("source")) - 1).alias(
            "source_idx"
        ),
        F.coalesce(F.sum("n_in_source").over(w), F.lit(0)).alias("offset"),
    )
    n_sources = src.count()
    out = ranked.join(F.broadcast(src), "source")
    rank_in_source = F.col("g") - F.col("offset")
    return out.select(
        "doc_id",
        "source",
        rank_in_source.cast("bigint").alias("rank_in_source"),
        ((rank_in_source - 1) * n_sources + F.col("source_idx"))
        .cast("bigint")
        .alias("stream_pos"),
    )


def _html_wrap_sql() -> str:
    """The same deterministic HTML wrapper the Spark query builds, as a
    DuckDB expression over documents.text."""
    return (
        "'<html><head><title>Doc</title><style>p{margin:0}</style>"
        "<script>var tracked = 1 < 2 && 3 > 2;</script></head>"
        "<body><div id=\"nav\"><a href=\"/\">Home</a> | "
        "<a href=\"/about\">About</a></div><!-- header ends -->"
        "<h1>Document ' || CAST(doc_id AS VARCHAR) || '</h1>"
        "<p>' || text || '</p><div class=\"footer\">&copy; Example "
        "&amp; Co &nbsp;2024</div></body></html>'"
    )


_HTML_WRAP_SPARK = (
    '<html><head><title>Doc</title><style>p{{margin:0}}</style>'
    '<script>var tracked = 1 < 2 && 3 > 2;</script></head>'
    '<body><div id="nav"><a href="/">Home</a> | '
    '<a href="/about">About</a></div><!-- header ends -->'
    "<h1>Document {did}</h1><p>{text}</p>"
    '<div class="footer">&copy; Example &amp; Co &nbsp;2024</div>'
    "</body></html>"
)


from datagouvfr_data_pipelines_spark.functions.text import html_to_text_sql as _h2t_sql

_H2T_EXPR = _h2t_sql("html")


@register(
    "t_html_extract",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_html_wrap_sql()} AS html
      FROM documents
      WHERE doc_id < 200 AND length(trim(text)) > 0
        AND NOT regexp_matches(text, '[<>&]')
    )
    SELECT doc_id,
           {_H2T_EXPR} AS extracted,
           CAST(length({_H2T_EXPR}) AS BIGINT) AS n_chars_extracted
    FROM raw
    ORDER BY doc_id
    """,
    tags=["text", "html", "extraction", "web-corpus"],
)
def t_html_extract(spark, sf_dir):
    """Web-corpus text extraction end to end: every document is wrapped
    in a realistic HTML page (head with style+script — the script even
    contains '<' and '&&' to punish naive strippers — nav bar, comment,
    h1, footer with entities), then ``html_to_text`` recovers the prose.
    The DuckDB oracle builds the SAME page and applies the SAME
    RE2-compatible regexp chain (``html_to_text_sql``), so the extracted
    string — structure newlines, decoded entities, collapsed whitespace —
    must match bit-for-bit. Shuffle-free scan-side map; at 100 TB this is
    one narrow codegen stage per crawl shard."""
    from datagouvfr_data_pipelines_spark.functions.text import html_to_text

    docs = (
        table(spark, sf_dir, "documents")
        .where(
            (F.col("doc_id") < 200)
            & (F.length(F.trim(F.col("text"))) > 0)
            & ~F.col("text").rlike("[<>&]")
        )
        .select(
            "doc_id",
            F.concat(
                F.lit(_HTML_WRAP_SPARK.split("{did}")[0].replace("{{", "{").replace("}}", "}")),
                F.col("doc_id").cast("string"),
                F.lit(_HTML_WRAP_SPARK.split("{did}")[1].split("{text}")[0]),
                F.col("text"),
                F.lit(_HTML_WRAP_SPARK.split("{text}")[1]),
            ).alias("html"),
        )
    )
    return docs.select(
        "doc_id",
        html_to_text("html").alias("extracted"),
        F.length(html_to_text("html")).cast("bigint").alias(
            "n_chars_extracted"
        ),
    ).orderBy("doc_id")


@register(
    "t_url_canonical_dedup",
    oracle="""
    SELECT doc_id,
           'https://example.com/articles/' || CAST(doc_id AS VARCHAR)
             || '?a=1&b=2' AS canonical,
           CAST(2 AS BIGINT) AS n_variants
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
    tags=["text", "url", "dedup", "web-corpus"],
)
def t_url_canonical_dedup(spark, sf_dir):
    """Crawl-frontier URL dedup: two syntactic variants of every page URL
    (mixed-case scheme/host, explicit default port, tracking params,
    shuffled param order, fragment) must collapse to ONE canonical form.
    The oracle is the ground-truth canonical string predicted from the
    documented rule set — the engine's regexp/array pipeline has to
    reproduce it bit-for-bit AND count exactly 2 variants per page.
    Scale shape: narrow map + one groupBy(canonical) — the exact-dedup
    shuffle every crawler runs."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        canonicalize_url,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    d = F.col("doc_id").cast("string")
    variant_a = F.concat(
        F.lit("HTTPS://Example.COM:443/articles/"), d,
        F.lit("?utm_source=feed&b=2&a=1#section-2"),
    )
    variant_b = F.concat(
        F.lit("https://example.com/articles/"), d,
        F.lit("?b=2&gclid=xyz&a=1"),
    )
    urls = docs.select(
        "doc_id", F.explode(F.array(variant_a, variant_b)).alias("url")
    )
    return (
        urls.select("doc_id", canonicalize_url("url").alias("canonical"))
        .groupBy("doc_id", "canonical")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_variants"))
        .orderBy("doc_id")
    )


@register(
    "t_mojibake_repair",
    oracle="""
    SELECT doc_id, text AS repaired,
           regexp_matches(text, '[^\\x00-\\x7F]') AS was_mojibake
    FROM documents
    WHERE doc_id < 300 AND length(trim(text)) > 0
      AND NOT regexp_matches(text, '[^\\x00-\\x{00FF}]')
    ORDER BY doc_id
    """,
    tags=["text", "encoding", "web-corpus"],
)
def t_mojibake_repair(spark, sf_dir):
    """Encoding-repair end to end with a ground-truth oracle: every
    Latin-1-representable document is DOUBLE-ENCODED Spark-side (its
    UTF-8 bytes re-read as Latin-1 — the exact corruption a
    misconfigured web server or database bridge produces), then
    ``fix_double_utf8`` must recover the ORIGINAL text bit-for-bit; the
    oracle simply returns the original. ``was_mojibake`` pins the gate
    logic: pure-ASCII docs are corruption fixed-points and must pass
    through the no-marker gate unchanged. Shuffle-free narrow map —
    encode/decode/regexp are all codegen built-ins."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        fix_double_utf8,
    )

    docs = table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 300)
        & (F.length(F.trim(F.col("text"))) > 0)
        & ~F.col("text").rlike("[^\u0000-\u00ff]")
    )
    corrupt = F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1")
    return docs.select(
        "doc_id",
        fix_double_utf8(corrupt).alias("repaired"),
        (corrupt != F.col("text")).alias("was_mojibake"),
    ).orderBy("doc_id")


@register(
    "t_mojibake_single",
    oracle="""
    SELECT doc_id, text AS repaired,
           regexp_matches(text, '[^\\x00-\\x7F]') AS was_mojibake
    FROM documents
    WHERE doc_id < 300 AND length(trim(text)) > 0
      AND NOT regexp_matches(text, '[^\\x00-\\x{00FF}]')
    ORDER BY doc_id
    """,
    tags=["text", "encoding", "web-corpus"],
)
def t_mojibake_single(spark, sf_dir):
    """The OTHER crawl corruption, with a ground-truth oracle: every
    Latin-1-representable document has its UTF-8 bytes mis-decoded ONCE
    as Windows-1252 Spark-side (latin-1 decode, then the C1 points the
    cp1252 printables shadow mapped onto those printables — '\u00e9'
    becomes '\u00c3\u00a9', an apostrophe U+2019 becomes
    '\u00e2\u20ac\u2122'), then ``fix_latin1_utf8`` must recover the
    ORIGINAL bit-for-bit; the oracle simply returns the original.
    Reference parity: the chardet ingest cascade
    (schema/utils/consolidation.py:905-947) guards this class at file
    level; this is the column-level repair. ``was_mojibake`` pins the
    gates: pure-ASCII docs are corruption fixed points. Shuffle-free
    narrow map, all codegen built-ins."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        _CP1252_C1,
        _CP1252_UNI,
        fix_latin1_utf8,
    )

    docs = table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 300)
        & (F.length(F.trim(F.col("text"))) > 0)
        & ~F.col("text").rlike("[^\u0000-\u00ff]")
    )
    corrupt = F.translate(
        F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1"),
        _CP1252_C1,
        _CP1252_UNI,
    )
    return docs.select(
        "doc_id",
        fix_latin1_utf8(corrupt).alias("repaired"),
        (corrupt != F.col("text")).alias("was_mojibake"),
    ).orderBy("doc_id")


@register(
    "t_boilerplate_domain",
    oracle="""
    WITH d AS (
      SELECT doc_id, 'd' || CAST(doc_id % 5 AS VARCHAR) AS domain,
             'HOME | ABOUT | CONTACT' || chr(10) || text || chr(10)
               || '(c) 2026 site d' || CAST(doc_id % 5 AS VARCHAR) AS text
      FROM documents WHERE doc_id < 240 AND length(trim(text)) > 0
    ), l AS (
      SELECT doc_id, domain,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM d
    ), pages AS (
      SELECT domain, COUNT(*) AS n_pages FROM d GROUP BY domain
    ), freq AS (
      SELECT domain, line, COUNT(*) AS df
      FROM (SELECT DISTINCT domain, line, doc_id FROM l
            WHERE length(trim(line)) > 0)
      GROUP BY domain, line
    ), flagged AS (
      SELECT f.domain, f.line FROM freq f JOIN pages p USING (domain)
      WHERE p.n_pages >= 3 AND f.df > 0.5 * p.n_pages
    )
    SELECT l.doc_id,
           coalesce(string_agg(
             CASE WHEN fl.line IS NULL THEN l.line END,
             chr(10) ORDER BY l.pos), '') AS text_clean,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN fl.line IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM l LEFT JOIN flagged fl
      ON l.domain = fl.domain AND l.line = fl.line
    GROUP BY l.doc_id
    """,
    tags=["text", "web-corpus", "boilerplate"],
)
def t_boilerplate_domain(spark, sf_dir):
    """Per-domain boilerplate line removal
    (functions/text.py:boilerplate_removal): every page of a synthetic
    5-domain crawl carries the same nav header and a per-domain footer —
    lines whose within-domain document frequency exceeds half the
    domain's pages are stripped, body text survives. The oracle
    replicates the full rule (distinct doc-frequency, min-pages floor,
    strict > threshold, blank lines exempt) in SQL. Scale shape: one
    (domain, line)-keyed groupBy, aggregation-shrunk flagged side on
    the join, no pair expansion."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        boilerplate_removal,
    )

    dom = F.concat(F.lit("d"), (F.col("doc_id") % 5).cast("string"))
    docs = (
        table(spark, sf_dir, "documents")
        .where((F.col("doc_id") < 240) & (F.length(F.trim(F.col("text"))) > 0))
        .select(
            "doc_id",
            dom.alias("domain"),
            F.concat_ws(
                "\n",
                F.lit("HOME | ABOUT | CONTACT"),
                F.col("text"),
                F.concat(F.lit("(c) 2026 site "), dom),
            ).alias("text"),
        )
    )
    return boilerplate_removal(
        docs, "doc_id", "text", "domain", max_domain_frac=0.5, min_pages=3
    )
