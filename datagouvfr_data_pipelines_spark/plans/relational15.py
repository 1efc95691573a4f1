"""Catalog batch 15 (round 3): incremental corpus ingestion — dedup a new
batch of documents against the fingerprint index of the already-curated
corpus without re-reading corpus text (operators/incremental_dedup.py).

The documents table is split deterministically: corpus = doc_id % 4 != 3
(already curated), batch = doc_id % 4 == 3 (the new ingest). Output is the
per-document ingest decision — scalar columns only, driver-canonicalizable.

Ref parity: replaces the reference's re-download-everything consolidation
dedup (schema/utils/consolidation.py:54-76) with index-vs-batch joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
    build_dedup_index,
    incremental_dedup,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table


def _split(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 4 != 3)
    batch = docs.where(F.col("doc_id") % 4 == 3)
    return corpus, batch


def _decisions(batch, res, id_col="doc_id"):
    """(doc, status) for every batch doc: ledger reasons + 'survived'."""
    survived = res.survivors.select(
        F.col(id_col).alias("doc"), F.lit("survived").alias("status")
    )
    return res.ledger.select(
        "doc", F.col("reason").alias("status")
    ).unionByName(survived)


@register(
    "d_incremental_exact_dedup",
    oracle="""
    WITH batch AS (
      SELECT doc_id,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS sha
      FROM documents WHERE doc_id % 4 = 3
    ),
    corpus AS (
      SELECT DISTINCT sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS sha
      FROM documents WHERE doc_id % 4 <> 3
    ),
    keep AS (SELECT sha, MIN(doc_id) AS keep_id FROM batch GROUP BY sha)
    SELECT b.doc_id AS doc,
           CASE WHEN b.sha IN (SELECT sha FROM corpus) THEN 'exact_corpus'
                WHEN b.doc_id <> k.keep_id THEN 'exact_batch'
                ELSE 'survived' END AS status
    FROM batch b JOIN keep k ON b.sha = k.sha
    """,
    tags=["dedup", "incremental", "O4"],
)
def d_incremental_exact_dedup(spark, sf_dir):
    """Incremental ingest, exact tier only (threshold=2.0 makes both
    near-dup verifiers unsatisfiable, so the decision is pure content-sha
    set logic — fully ANSI-SQL reproducible and hash-checked). One index
    build over the corpus split + one over the batch, then semi-join on
    sha vs the index and min-id survivor within the batch."""
    corpus, batch = _split(spark, sf_dir)
    # production reads the index from parquet; built inline here it feeds
    # several joins, so persist it instead of re-deriving the signatures
    idx = build_dedup_index(corpus, "doc_id", "text").persist()
    res = incremental_dedup(batch, idx, "doc_id", "text", threshold=2.0)
    return _decisions(batch, res)


def _incremental_dedup_oracle(
    k: int = 64, bands: int = 8, threshold: float = 0.8, cap: int = 64
) -> str:
    """DuckDB replica of the FULL portable incremental-dedup decision:
    exact sha tiers + LSH-vs-corpus with capped buckets and signature
    agreement + exact-Jaccard within the batch, with reason precedence."""
    from datagouvfr_data_pipelines_spark.operators.dedup import _minhash_params

    rows = k // bands
    mins = ",\n             ".join(
        f"CAST(list_min(list_transform(hs, v -> ({a} * v + {b}) % 2147483647)) AS BIGINT)"
        for (a, b) in _minhash_params(k, seed=42)
    )
    agree_min = int(threshold * k)
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, text,
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
    ), sig AS (
      SELECT doc_id, hs,
             [{mins}] AS sig
      FROM h
    ), bandkeys AS (
      SELECT doc_id, r.b AS band,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 sig[CAST(r.b * {rows} + 1 AS INT) : CAST(r.b * {rows} + {rows} AS INT)]),
               (acc, x) -> (acc * 131 + x) % 2147483647) AS bh
      FROM sig CROSS JOIN range(0, {bands}) r(b)
    ), shas AS (
      SELECT doc_id,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS sha
      FROM t
    ), batch AS (SELECT doc_id FROM t WHERE doc_id % 4 = 3),
    corpus AS (SELECT doc_id FROM t WHERE doc_id % 4 <> 3),
    exact_corpus AS (
      SELECT b.doc_id FROM batch b JOIN shas sb ON sb.doc_id = b.doc_id
      WHERE sb.sha IN (SELECT sc.sha FROM corpus c JOIN shas sc ON sc.doc_id = c.doc_id)
    ),
    keep AS (
      SELECT sb.sha, MIN(b.doc_id) AS keep_id
      FROM batch b JOIN shas sb ON sb.doc_id = b.doc_id GROUP BY sb.sha
    ),
    exact_batch AS (
      SELECT b.doc_id
      FROM batch b JOIN shas sb ON sb.doc_id = b.doc_id
      JOIN keep k2 ON k2.sha = sb.sha
      WHERE b.doc_id <> k2.keep_id
    ),
    bbands AS (
      SELECT bk.doc_id, bk.band, bk.bh
      FROM bandkeys bk JOIN batch b ON b.doc_id = bk.doc_id
    ),
    bkeys AS (SELECT DISTINCT band, bh FROM bbands),
    cmatched AS (
      SELECT bk.band, bk.bh, bk.doc_id AS cdoc,
             ROW_NUMBER() OVER (PARTITION BY bk.band, bk.bh ORDER BY bk.doc_id)
               AS rn
      FROM bandkeys bk
      JOIN corpus c ON c.doc_id = bk.doc_id
      JOIN bkeys kk ON kk.band = bk.band AND kk.bh = bk.bh
    ),
    cand AS (
      SELECT DISTINCT bb.doc_id AS doc, cm.cdoc
      FROM bbands bb
      JOIN cmatched cm ON cm.band = bb.band AND cm.bh = bb.bh AND cm.rn <= {cap}
    ),
    near_corpus AS (
      SELECT DISTINCT c.doc AS doc_id FROM cand c
      JOIN sig s1 ON s1.doc_id = c.doc
      JOIN sig s2 ON s2.doc_id = c.cdoc
      WHERE len(list_filter(generate_series(1, {k}),
                            i -> s1.sig[i] = s2.sig[i])) >= {agree_min}
    ),
    nb_buckets AS (
      SELECT band, bh FROM bbands GROUP BY band, bh
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ),
    nb_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b
      FROM nb_buckets nb
      JOIN bbands a ON a.band = nb.band AND a.bh = nb.bh
      JOIN bbands c2 ON c2.band = nb.band AND c2.bh = nb.bh
                    AND a.doc_id < c2.doc_id
    ),
    near_batch AS (
      SELECT DISTINCT n.id_b AS doc_id FROM nb_cand n
      JOIN h ha ON ha.doc_id = n.id_a
      JOIN h hb ON hb.doc_id = n.id_b
      WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(ha.hs, hb.hs))) AS DOUBLE)
            >= {threshold}
    )
    SELECT b.doc_id AS doc,
           CASE WHEN b.doc_id IN (SELECT doc_id FROM exact_corpus) THEN 'exact_corpus'
                WHEN b.doc_id IN (SELECT doc_id FROM exact_batch) THEN 'exact_batch'
                WHEN b.doc_id IN (SELECT doc_id FROM near_corpus) THEN 'near_corpus'
                WHEN b.doc_id IN (SELECT doc_id FROM near_batch) THEN 'near_batch'
                ELSE 'survived' END AS status
    FROM batch b
    """


@register(
    "d_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
    tags=["dedup", "incremental", "minhash", "flagship"],
)
def d_incremental_dedup(spark, sf_dir):
    """Full incremental ingest decision: exact tiers plus MinHash-LSH
    near-dup vs the corpus index (signature-agreement verify — the corpus
    text is never read) and exact-Jaccard near-dup within the batch.
    Oracle-checked end to end (round 4): with the portable hash family
    (rolling shingle hash, banded fold keys) every tier — index build,
    capped corpus buckets, signature agreement, batch Jaccard, reason
    precedence — reproduces in one DuckDB query; the xxhash64 index stays
    the default for production callers."""
    corpus, batch = _split(spark, sf_dir)
    idx = build_dedup_index(corpus, "doc_id", "text", portable=True).persist()
    res = incremental_dedup(
        batch, idx, "doc_id", "text", threshold=0.8, portable=True
    )
    return _decisions(batch, res)


def _pagerank_exact_oracle(iters: int = 6) -> str:
    """Unrolled integer-PageRank oracle: one CTE trio per iteration.

    Recursive CTEs can't aggregate in the recursive member, so the fixed
    iteration count is unrolled mechanically — the SQL mirrors
    operators/graph.py:pagerank_exact term for term (BIGINT pico-units,
    floor division at 1/n, rank/deg, share/n, damping = (17*x)//20).
    """
    scale = 1_000_000_000_000
    sql = """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (
      SELECT node, CAST({scale} AS BIGINT) // (SELECT n FROM nn) AS rank
      FROM nodes
    )""".replace("{scale}", str(scale))
    for i in range(iters):
        sql += f""",
    in{i} AS (
      SELECT e.dst AS node, SUM(r.rank // deg.d) AS inn
      FROM edges e
      JOIN r{i} r ON r.node = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    dang{i} AS (
      SELECT COALESCE(SUM(r.rank), 0) // (SELECT n FROM nn) AS share
      FROM r{i} r WHERE r.node NOT IN (SELECT src FROM edges)
    ),
    r{i + 1} AS (
      SELECT n.node,
             (3 * {scale}) // (20 * (SELECT n FROM nn))
             + (17 * (COALESCE(i.inn, 0) + (SELECT share FROM dang{i}))) // 20
               AS rank
      FROM nodes n LEFT JOIN in{i} i ON i.node = n.node
    )"""
    return sql + f"\n    SELECT node, rank FROM r{iters}"


@register(
    "g_pagerank_exact",
    oracle=_pagerank_exact_oracle(6),
    tags=["graph", "pagerank", "integer-exact"],
)
def g_pagerank_exact(spark, sf_dir):
    """Bit-exact PageRank (BIGINT pico-units) over the customer->supplier
    purchase graph — the hash-verifiable twin of g_pagerank: identical
    iteration structure, integer floor-division arithmetic, so the driver
    gate can compare full 6-iteration results value-for-value."""
    from datagouvfr_data_pipelines_spark.operators.graph import pagerank_exact

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )
    return pagerank_exact(edges, "src", "dst", iterations=6)


def _qinterp_sql(p: float, alias: str) -> str:
    """DuckDB replica of sketches.quantile_estimate's interpolation at
    probability ``p`` over sorted list ``vs`` of length ``n`` — identical
    IEEE expression order (v_lo + frac * (v_hi - v_lo))."""
    pos = f"({p} * (CAST(n AS DOUBLE) - 1))"
    lo = f"CAST(floor({pos}) AS INT)"
    frac = f"({pos} - floor({pos}))"
    v_lo = f"vs[{lo} + 1]"
    v_hi = f"vs[least({lo} + 2, CAST(n AS INT))]"
    return f"{v_lo} + {frac} * ({v_hi} - {v_lo}) AS {alias}"


@register(
    "sk_quantile_rollup",
    oracle=f"""
    WITH h AS (
      SELECT o_orderstatus,
             ((((o_orderkey % 2147483647) * 1103515245 + 12345) % 2147483647)
              * 784588716 + 997) % 2147483647 AS h,
             CAST(o_totalprice AS DOUBLE) AS v
      FROM orders
    ),
    ranked AS (
      SELECT o_orderstatus, h, v,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY h, v)
               AS rn
      FROM h
    ),
    st AS (
      SELECT o_orderstatus, list(v ORDER BY v) AS vs, COUNT(*) AS n
      FROM ranked WHERE rn <= 1024 GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           {_qinterp_sql(0.5, "q0_5")},
           {_qinterp_sql(0.95, "q0_95")}
    FROM st
    """,
    tags=["sketch", "quantile", "incremental"],
)
def sk_quantile_rollup(spark, sf_dir):
    """Incremental quantile rollup: per-orderstatus order-value p50/p95
    maintained from MERGEABLE bottom-k-hash sample states built per year
    (operators/sketches.py:quantile_sample_states) — the quantile face of
    the partial_agg_states rollup; merging the yearly states is bit-equal
    to a direct build (test-pinned), so history is never rescanned.

    Oracle-checked (round 4): sampling by the ANSI-portable LCG id hash
    (sketches.portable_id_hash), so the DuckDB replica takes the same
    bottom-1024 per status DIRECTLY (merge associativity means per-year
    states + merge == one global bottom-k) and interpolates with the
    identical IEEE expression — full value compare, not rows-only."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        quantile_estimate,
        quantile_sample_merge,
        quantile_sample_states,
    )

    o = table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    years = [r["yr"] for r in o.select("yr").distinct().collect()]
    states = [
        quantile_sample_states(
            o.where(F.col("yr") == y),
            ["o_orderstatus"],
            "o_totalprice",
            "o_orderkey",
            k=1024,
            portable=True,
        )
        for y in sorted(years)
    ]
    merged = quantile_sample_merge(states, ["o_orderstatus"], k=1024)
    return quantile_estimate(merged, [0.5, 0.95], ["o_orderstatus"])


@register(
    "a28_revenue_trend",
    oracle="""
    WITH monthly AS (
      SELECT n.n_name,
             (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate)) AS ym,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))
                      * 10000 AS BIGINT)) AS y
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    based AS (
      SELECT n_name, ym - (SELECT MIN(ym) FROM monthly) AS x, y FROM monthly
    ),
    sums AS (
      SELECT n_name,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM based GROUP BY n_name
    )
    SELECT n_name,
           n AS n_months,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 10000.0 AS slope,
           (CAST(sy AS DOUBLE) / 10000.0
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) / 10000.0)
               * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM sums
    """,
    tags=["A15", "regression", "trend"],
)
def a28_revenue_trend(spark, sf_dir):
    """Per-nation OLS trend of monthly revenue: slope/intercept from the
    five algebraic sums (n, Σx, Σy, Σxy, Σx²) — one partial-aggregated
    shuffle over (nation, month), then per-nation folds. Revenue is held
    as EXACT integer hundredths-of-cents (decimal product x10000 ->
    BIGINT) and the month index is rebased to 0 (keeps n*Σxy inside
    int64), so both engines do the identical single IEEE division —
    hash-exact. The sums themselves merge, so the trend is maintainable
    incrementally like partial_agg_states."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            * 10000
        ).cast("long").alias("cents4"),
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # customer joins by shuffle (it is NOT broadcastable at scale);
    # nation is the only broadcast dim
    enriched_cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    monthly = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(enriched_cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name", "ym")
        .agg(F.sum("cents4").alias("y"))
    )
    min_ym = monthly.agg(F.min("ym").alias("__min_ym"))
    based = monthly.crossJoin(F.broadcast(min_ym)).select(
        "n_name", (F.col("ym") - F.col("__min_ym")).alias("x"), "y"
    )
    sums = based.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den / F.lit(10000.0)
    intercept = (
        F.col("sy").cast("double") / F.lit(10000.0) - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return sums.select(
        "n_name",
        F.col("n").alias("n_months"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


@register(
    "q_k_anonymity",
    oracle="""
    SELECT c_mktsegment, n_name, acctbal_band, group_size
    FROM (
      SELECT c.c_mktsegment, n.n_name,
             CAST(FLOOR(c.c_acctbal / 2000) AS BIGINT) AS acctbal_band,
             COUNT(*) AS group_size
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2, 3
    ) g
    WHERE group_size < 5
    """,
    tags=["quality", "privacy", "k-anonymity"],
)
def q_k_anonymity(spark, sf_dir):
    """Privacy audit before an open-data publish: quasi-identifier combos
    (segment, nation, coarse balance band) shared by fewer than k=5
    customers — each is a re-identification risk (quality.py:
    k_anonymity_audit). One partial-aggregated shuffle."""
    from datagouvfr_data_pipelines_spark.quality import k_anonymity_audit

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_mktsegment",
        "n_name",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("acctbal_band"),
    )
    return k_anonymity_audit(joined, ["c_mktsegment", "n_name", "acctbal_band"], k=5)


@register(
    "p12_unpivot_balances",
    oracle="""
    SELECT n_name, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT n.n_name,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
             CAST(MIN(c.c_acctbal) AS DOUBLE) AS min_bal,
             CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_bal,
             CAST(COUNT(*) AS DOUBLE) AS n_cust
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ) wide
    UNPIVOT (val FOR metric IN (total_bal, min_bal, max_bal, n_cust))
    """,
    tags=["P1", "unpivot", "melt"],
)
def p12_unpivot_balances(spark, sf_dir):
    """Wide-to-long UNPIVOT (melt): per-nation balance metrics computed
    once, then rotated to (nation, metric, val) rows with the built-in
    ``unpivot`` — a zero-shuffle projection-time expansion (x4 rows, no
    exchange), the inverse of the A1 pivot. Decimal-exact total, then one
    cast to double per cell so both engines emit identical bits."""
    from datagouvfr_data_pipelines_spark.operators.aggregates import dsum

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum("c_acctbal", "total_bal"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            F.count(F.lit(1)).cast("double").alias("n_cust"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["total_bal", "min_bal", "max_bal", "n_cust"],
        "metric",
        "val",
    )


@register(
    "j19_fuzzy_part_match",
    oracle="""
    WITH t AS (
      SELECT p_partkey AS id, p_name AS name,
             string_split(p_name, ' ')[2] AS noun,
             substr(string_split(p_name, ' ')[1], 1, 1) AS a1
      FROM part
    ),
    sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY noun, a1) AS bs FROM t
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.name, b.name) AS dist
    FROM sized a
    JOIN sized b ON a.noun = b.noun AND a.a1 = b.a1 AND a.id < b.id
    WHERE a.bs <= 64 AND levenshtein(a.name, b.name) <= 3
    """,
    tags=["J13", "entity-resolution", "fuzzy"],
)
def j19_fuzzy_part_match(spark, sf_dir):
    """Entity-resolution fuzzy self-match over part names: block on
    (noun token, first letter of the adjective), expand pairs
    bucket-locally, verify with the BUILT-IN levenshtein <= 3
    (operators/joins.py:fuzzy_name_pairs). Blocking keeps candidates
    linear in parts; the edit-distance kernel runs only on them."""
    from datagouvfr_data_pipelines_spark.operators.joins import fuzzy_name_pairs

    p = table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return fuzzy_name_pairs(
        p,
        "p_partkey",
        "p_name",
        block_exprs=[toks[1], F.substring(toks[0], 1, 1)],
        max_edit=3,
        max_block=64,
    )


_MIX_WEIGHTS = {"en": 400000, "fr": 200000, "de": 150000, "es": 150000, "zh": 100000}


@register(
    "asm_mixture_plan",
    oracle="""
    WITH tot AS (
      SELECT lang AS domain, SUM(n_chars) AS tokens FROM documents GROUP BY lang
    ),
    w(domain, target_ppm) AS (
      VALUES ('en', 400000), ('fr', 200000), ('de', 150000),
             ('es', 150000), ('zh', 100000)
    ),
    j AS (
      SELECT t.domain, t.tokens, COALESCE(w.target_ppm, 0) AS target_ppm
      FROM tot t LEFT JOIN w ON w.domain = t.domain
    ),
    bud AS (SELECT SUM(tokens) // 2 AS b FROM tot),
    pool AS (
      SELECT *, CAST(tokens AS DOUBLE) / target_ppm AS c
      FROM j WHERE target_ppm > 0
    ),
    cuts AS (
      SELECT domain, c,
             COALESCE(SUM(tokens) OVER (ORDER BY c, domain
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_tok,
             SUM(target_ppm) OVER (ORDER BY c, domain
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf_w
      FROM pool
    ),
    lamq AS (
      SELECT (CAST((SELECT b FROM bud) AS DOUBLE) - pre_tok) / suf_w AS lam
      FROM cuts
      WHERE (CAST((SELECT b FROM bud) AS DOUBLE) - pre_tok) / suf_w < c
      ORDER BY c, domain LIMIT 1
    ),
    lamv AS (SELECT COALESCE((SELECT lam FROM lamq), 1e18) AS lam)
    SELECT j.domain, j.tokens, j.target_ppm,
           CASE WHEN j.target_ppm > 0 AND j.tokens > 0
                THEN LEAST(1.0, ((SELECT lam FROM lamv) * j.target_ppm) / j.tokens)
                ELSE 0.0 END AS rate,
           j.tokens * CASE WHEN j.target_ppm > 0 AND j.tokens > 0
                THEN LEAST(1.0, ((SELECT lam FROM lamv) * j.target_ppm) / j.tokens)
                ELSE 0.0 END AS planned_tokens
    FROM j
    """,
    tags=["assembly", "mixture", "waterfilling"],
)
def asm_mixture_plan(spark, sf_dir):
    """Training-mixture waterfilling: per-language sampling rates hitting
    target weights under a budget of half the corpus's tokens
    (operators/assembly.py:mixture_plan — closed-form cut over the k-row
    per-domain totals, driver scalar pass). The oracle solves the same
    closed form with window prefix/suffix sums; identical IEEE expression
    order makes it hash-exact."""
    from datagouvfr_data_pipelines_spark.operators.assembly import mixture_plan

    docs = table(spark, sf_dir, "documents").select("lang", "n_chars")
    budget = (
        docs.agg(F.sum("n_chars").alias("t")).collect()[0]["t"] // 2
    )
    return mixture_plan(docs, "lang", "n_chars", _MIX_WEIGHTS, budget)


@register(
    "w18_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, d, cnt,
             COUNT(*) OVER w AS n,
             SUM(cnt) OVER w AS s,
             SUM(cnt * cnt) OVER w AS ss
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, d, cnt,
           (CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                    / (CAST(n AS DOUBLE) * (n - 1))) AS z
    FROM stats
    WHERE n >= 14
      AND (CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s) > 0
      AND ABS((CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / n)
              / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                     / (CAST(n AS DOUBLE) * (n - 1)))) > 2.5
    """,
    tags=["window", "anomaly", "monitoring"],
)
def w18_anomaly_days(spark, sf_dir):
    """Volume-anomaly monitor: per event type, days whose count deviates
    more than 2.5 sigma from the TRAILING 28-day window (window excludes
    the current day, so the anomaly can't pollute its own baseline; >= 14
    days warmup). Rolling n/Σ/Σ² stay exact BIGINTs in the window frame;
    mean, variance and z are a fixed IEEE expression over them (one sqrt),
    so both engines emit identical bits. One window shuffle over the
    per-day pre-aggregate — the daily groupBy has already collapsed the
    event volume, so the window state is days, not events."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-28, -1)
    )
    stats = daily.select(
        "event_type",
        "d",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    nD = F.col("n").cast("double")
    sD = F.col("s").cast("double")
    var_num = nD * F.col("ss") - sD * F.col("s")
    z = (F.col("cnt").cast("double") - sD / F.col("n")) / F.sqrt(
        var_num / (nD * (F.col("n") - 1))
    )
    return (
        stats.where((F.col("n") >= 14) & (var_num > 0) & (F.abs(z) > 2.5))
        .select("event_type", "d", "cnt", z.alias("z"))
    )
