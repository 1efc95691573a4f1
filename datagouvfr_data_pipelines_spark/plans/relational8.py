"""Catalog batch 8 (round 3): snapshot history (SCD2), incremental rollup
maintenance via mergeable agg states, interval-overlap join, corpus-global
line dedup, and bigram-LM quality scoring.

Every query here is DuckDB-oracle-checked; float outputs follow the engine's
determinism policy (decimal-exact sums, integer-domain log2, nano-quantized
float accumulation — see operators/aggregates.py and functions/text.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.plans.catalog import register, table


_H1_SCD2_SQL = """
    WITH o AS (
      SELECT o_custkey, o_orderdate AS ts, o_orderkey AS tb,
             o_orderstatus AS st
      FROM orders
    ), m AS (
      SELECT o_custkey, ts, tb, st,
             CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
                  WHEN st IS DISTINCT FROM LAG(st) OVER w THEN 1
                  ELSE 0 END AS is_new
      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, tb)
    ), r AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY o_custkey ORDER BY ts, tb ROWS UNBOUNDED PRECEDING
      ) AS run FROM m
    ), g AS (
      SELECT o_custkey, run, st AS o_orderstatus,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_observations
      FROM r GROUP BY o_custkey, run, st
    )
    SELECT o_custkey, o_orderstatus, valid_from, n_observations,
           LEAD(valid_from) OVER w2 AS valid_to,
           LEAD(valid_from) OVER w2 IS NULL AS is_current
    FROM g WINDOW w2 AS (PARTITION BY o_custkey ORDER BY valid_from, run)
"""


@register(
    "h1_scd2_history",
    oracle=_H1_SCD2_SQL,
    tags=["history", "scd2", "window"],
)
def h1_scd2_history(spark, sf_dir):
    """SCD2 validity intervals over order-status observations per customer
    (operators/history.py:scd2_history) — the read-side complement of the
    reference's forward-applied CDC (meteo pg_processing CDC apply)."""
    from datagouvfr_data_pipelines_spark.operators.history import scd2_history

    orders = table(spark, sf_dir, "orders")
    return scd2_history(
        orders,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )


@register(
    "inc_merged_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(l_extendedprice) AS BIGINT) AS nb,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(l_extendedprice) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["aggregation", "incremental", "merge-states"],
)
def inc_merged_rollup(spark, sf_dir):
    """Incremental rollup maintenance: two disjoint snapshot batches ->
    partial_agg_states each -> merge_agg_states -> finalize. The oracle is
    the DIRECT aggregate over the full table — passing proves the merge is
    lossless (operators/aggregates.py:partial_agg_states)."""
    from datagouvfr_data_pipelines_spark.operators.aggregates import (
        merge_agg_states,
        partial_agg_states,
    )

    li = table(spark, sf_dir, "lineitem")
    batches = [
        partial_agg_states(
            li.where(F.col("l_orderkey") % 2 == i),
            ["l_returnflag"],
            "l_extendedprice",
        )
        for i in (0, 1)
    ]
    merged = merge_agg_states(batches, ["l_returnflag"])
    return merged.select(
        "l_returnflag",
        F.col("st_count").alias("nb"),
        F.col("st_sum").cast("double").alias("sum_price"),
        F.col("st_min").alias("min_price"),
        F.col("st_max").alias("max_price"),
        (F.col("st_sum").cast("double") / F.col("st_count")).alias("avg_price"),
    )


@register(
    "j15_interval_overlap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
      FROM events
    )
    SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id
    """,
    tags=["join", "interval", "range"],
)
def j15_interval_overlap(spark, sf_dir):
    """Interval-overlap self-join: count overlapping 30-minute activity
    windows per user (operators/joins.py:interval_overlap_join). The oracle
    is the naive range-predicate join; the engine's bin-bucketed equi-join
    computes the same pairs with one (key, bin) shuffle instead of a
    per-key cartesian."""
    from datagouvfr_data_pipelines_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + F.lit(1_800_000_000)).alias("e"),
    )
    pairs = interval_overlap_join(
        ev,
        ev,
        key_cols=["user_id"],
        left_start="s",
        left_end="e",
        right_start="s",
        right_end="e",
        bin_width=1_800_000_000,
    ).where(F.col("event_id") < F.col("event_id_r"))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@register(
    "t_line_dedup",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM documents
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY line ORDER BY doc_id, pos
      ) = 1 AS first FROM l
    )
    SELECT doc_id,
           coalesce(
             string_agg(CASE WHEN first THEN line END, chr(10) ORDER BY pos),
             ''
           ) AS text_clean,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN first THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM r GROUP BY doc_id
    """,
    tags=["text", "dedup", "c4"],
)
def t_line_dedup(spark, sf_dir):
    """C4-style corpus-global line dedup: keep the first occurrence of each
    exact line (total order = (doc_id, position)), reassemble documents
    (functions/text.py:line_dedup)."""
    from datagouvfr_data_pipelines_spark.functions.text import line_dedup

    docs = table(spark, sf_dir, "documents")
    return line_dedup(docs, "doc_id", "text")


@register(
    "t_bigram_logprob",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        AND length(trim(text)) > 0
    ), v AS (
      SELECT COUNT(DISTINCT tok) AS vs
      FROM (SELECT unnest(t) AS tok FROM tk)
    ), bg AS (
      SELECT doc_id,
             unnest(t[1:len(t)-1]) || ' ' || unnest(t[2:len(t)]) AS g
      FROM tk
    ), bc AS (
      SELECT g, COUNT(*) AS c12 FROM bg GROUP BY g
    ), cc AS (
      SELECT string_split(g, ' ')[1] AS w1, SUM(c12) AS c1
      FROM bc GROUP BY string_split(g, ' ')[1]
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(
             (SUM(CAST(floor(
               (log2(bc.c12 + 1) - log2(cc.c1 + (SELECT vs FROM v))) * 1e9
             ) AS BIGINT)) / 1e9) / COUNT(*), 6
           ) AS avg_log2_prob
    FROM bg
    JOIN bc ON bg.g = bc.g
    JOIN cc ON string_split(bg.g, ' ')[1] = cc.w1
    GROUP BY bg.doc_id
    """,
    tags=["text", "quality", "language-model"],
)
def t_bigram_logprob(spark, sf_dir):
    """Self-trained bigram-LM scoring with add-one smoothing — per-document
    mean log2 P(w_i | w_{i-1}) as an n-gram perplexity quality signal
    (functions/text.py:bigram_lm_scores). The vocabulary size is a driver
    scalar (one count job), same policy as k-means centroids."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        bigram_lm_scores,
        tokens,
    )

    docs = table(spark, sf_dir, "documents")
    eligible = docs.select(tokens("text").alias("__t")).where(F.size("__t") >= 2)
    vocab = (
        eligible.select(F.explode("__t").alias("tok"))
        .agg(F.countDistinct("tok"))
        .collect()[0][0]
    )
    return bigram_lm_scores(docs, "doc_id", "text", vocab_size=vocab)


@register(
    "t_dup_span_stats",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
      WHERE length(trim(text)) > 0
        AND len(string_split_regex(lower(trim(text)), '\s+')) >= 8
    ), sp AS (
      SELECT doc_id,
             unnest(t[1:len(t)-7]) || ' ' || unnest(t[2:len(t)-6]) || ' ' ||
             unnest(t[3:len(t)-5]) || ' ' || unnest(t[4:len(t)-4]) || ' ' ||
             unnest(t[5:len(t)-3]) || ' ' || unnest(t[6:len(t)-2]) || ' ' ||
             unnest(t[7:len(t)-1]) || ' ' || unnest(t[8:len(t)]) AS g
      FROM tk
    ), c AS (
      SELECT g, COUNT(*) AS cnt FROM sp GROUP BY g
    )
    SELECT sp.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_span_frac
    FROM sp JOIN c ON sp.g = c.g
    GROUP BY sp.doc_id
    """,
    tags=["text", "dedup", "span"],
)
def t_dup_span_stats(spark, sf_dir):
    """Within-corpus duplicated 8-token-span detection (functions/text.py:
    duplicated_span_stats) — the n-gram approximation of suffix-array
    training-data dedup; per-doc duplicated-span fraction for gating."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        duplicated_span_stats,
    )

    docs = table(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, "doc_id", "text", n=8)


def _pq_oracle(
    m: int = 4,
    k: int = 16,
    iterations: int = 2,
    dim: int = 64,
    top_k: int = 10,
    probe_id: int = 3,
) -> str:
    """DuckDB replica of the FULL portable PQ pipeline: per-subspace
    LCG-seeded Lloyd's (nano-quantized updates), encode = per-subspace
    argmin, ADC = sum of probe->sub-centroid distances in subspace order."""
    sub = dim // m
    lcg = (
        "((((vec_id % 2147483647) * 1103515245 + 12345) % 2147483647) * 784588716 + 997)"
        " % 2147483647"
    )

    def dsub(off: int, e: str, c: str) -> str:
        t = f"(CAST({e}[{off} + i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {sub}), i -> {t} * {t})), "
            f"(acc, x) -> acc + x)"
        )

    parts = ["    WITH "]
    first = True
    for j in range(m):
        off = j * sub
        lead = "" if first else ","
        first = False
        parts.append(
            f"""{lead}
    c{j}_0 AS (
      SELECT cell, list_transform(generate_series(1, {sub}),
                                  i -> CAST(c[{off} + i] AS DOUBLE)) AS c
      FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY {lcg}, vec_id) - 1 AS cell,
               embedding AS c
        FROM embeddings) WHERE cell < {k}
    )"""
        )
        for t in range(1, iterations + 1):
            parts.append(
                f""",
    a{j}_{t} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dsub(off, 'e.embedding', 's.c')},
                                           s.cell) AS rn
        FROM embeddings e CROSS JOIN c{j}_{t - 1} s
      ) WHERE rn = 1
    ),
    u{j}_{t} AS (
      SELECT cell, i AS pos,
             SUM(CAST(FLOOR(CAST(embedding[{off} + i] AS DOUBLE)
                            * 1000000000.0) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM a{j}_{t} CROSS JOIN generate_series(1, {sub}) t(i)
      GROUP BY cell, i
    ),
    c{j}_{t} AS (
      SELECT s.cell, COALESCE(ua.c, s.c) AS c
      FROM c{j}_{t - 1} s LEFT JOIN (
        SELECT cell, list((s / n) / 1000000000.0 ORDER BY pos) AS c
        FROM u{j}_{t} GROUP BY cell
      ) ua USING (cell)
    )"""
            )
        parts.append(
            f""",
    af{j} AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, s.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dsub(off, 'e.embedding', 's.c')},
                                           s.cell) AS rn
        FROM embeddings e CROSS JOIN c{j}_{iterations} s
      ) WHERE rn = 1
    ),
    pd{j} AS (
      SELECT s.cell, {dsub(off, 'pr.p', 's.c')} AS v
      FROM c{j}_{iterations} s,
           (SELECT embedding AS p FROM embeddings WHERE vec_id = {probe_id}) pr
    )"""
        )
    adc = "0.0"
    for j in range(m):
        adc = f"({adc} + pd{j}.v)"
    joins = "af0"
    for j in range(1, m):
        joins += f" JOIN af{j} ON af{j}.vec_id = af0.vec_id"
    for j in range(m):
        joins += f" JOIN pd{j} ON pd{j}.cell = af{j}.cell"
    parts.append(
        f"""
    SELECT af0.vec_id, round({adc}, 6) AS adc_dist
    FROM {joins}
    ORDER BY adc_dist ASC, af0.vec_id ASC LIMIT {top_k}
    """
    )
    return "".join(parts)


@register("sim_pq_search", oracle=_pq_oracle(), tags=["similarity", "pq"])
def sim_pq_search(spark, sf_dir):
    """Product-quantization ANN: m=4 sub-codebooks (k=16 each, seeded
    Lloyd's), encode to 4 sub-centroid ids, ADC top-10 via driver-side
    distance tables (functions/similarity.py:pq_fit/pq_encode/pq_search).
    Oracle-checked end to end (round 4): the portable trainer (LCG seeds,
    integer nano-unit centroid sums) plus sequential distance folds let a
    DuckDB query replay all four codebooks, the encoding argmins, and the
    ADC accumulation in subspace order; recall-vs-brute-force stays pinned
    in tests/test_pq.py."""
    from datagouvfr_data_pipelines_spark.functions.similarity import (
        pq_encode,
        pq_fit,
        pq_search,
    )

    emb = table(spark, sf_dir, "embeddings")
    books = pq_fit(
        emb, "embedding", m=4, k=16, iterations=2,
        portable=True, init_id_col="vec_id",
    )
    enc = pq_encode(emb, "embedding", books)
    probe = [
        float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]
    ]
    return pq_search(enc, "vec_id", probe, books, top_k=10)


_PIT_DATE = "1997-01-01"


@register(
    "h2_point_in_time",
    oracle=f"""
    SELECT o_custkey, o_orderstatus, valid_from, n_observations
    FROM ({_H1_SCD2_SQL}) h
    WHERE h.valid_from <= TIMESTAMP '{_PIT_DATE}'
      AND (h.valid_to IS NULL OR h.valid_to > TIMESTAMP '{_PIT_DATE}')
    """,
    tags=["history", "scd2", "point-in-time"],
)
def h2_point_in_time(spark, sf_dir):
    """Point-in-time snapshot over the SCD2 history: the state of every
    customer's order-status dimension AS OF {_PIT_DATE} — the read that
    makes bitemporal history useful (training-data reproducibility,
    audit reconstruction). Pure interval predicate over h1_scd2_history's
    validity intervals: no join, no extra shuffle beyond the history
    build; at scale the filter prunes history partitions when valid_from
    is a partition column."""
    from datagouvfr_data_pipelines_spark.operators.history import scd2_history

    orders = table(spark, sf_dir, "orders")
    h = scd2_history(
        orders,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )
    d = F.lit(_PIT_DATE).cast("timestamp")
    return h.where(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).select("o_custkey", "o_orderstatus", "valid_from", "n_observations")
