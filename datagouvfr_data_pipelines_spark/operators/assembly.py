"""Dataset-assembly operators: chunking, deterministic splits, stratified
sampling — the step between a curated corpus and a training run.

All three are engine-portable by construction (md5 content hash / plain
arithmetic / window ranks, no engine-specific hash), so each has a DuckDB
oracle in ``plans/dataset_assembly.py``. The split/sample key is
``fingerprint_md5`` (60-bit md5 prefix): reproducible in ANSI SQL — an
external system can recompute membership without running Spark — AND
JVM-codegen fast (the earlier rolling-polynomial fold was interpreted
per-character and measured 6x slower at the 10x document scale point).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.text import (
    fingerprint_md5,
    fingerprint_rolling,
    tokens,
    word_shingles,
)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_size``
    tokens advancing by ``chunk_size - overlap`` (context-window packing
    prep). Pure per-row explode — no shuffle, scales with executors; chunk
    ids are derived from the start offset so they are stable under any
    partitioning. Zero-token docs produce no chunks. The final chunk may be
    short (it is never silently dropped: truncation loses tail tokens,
    which at corpus scale is a measurable data loss).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_size ({chunk_size})")
    step = chunk_size - overlap
    toks = df.select(
        F.col(id_col).alias(id_col), tokens(text_col).alias("__t")
    ).where(F.size("__t") >= 1)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__t") - overlap, F.lit(1)), F.lit(step)
    )
    return toks.select(id_col, "__t", F.explode(starts).alias("__s")).select(
        id_col,
        ((F.col("__s") - 1) / step).cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.slice("__t", F.col("__s"), chunk_size)).alias("chunk_text"),
        F.least(F.lit(chunk_size), F.size("__t") - F.col("__s") + 1)
        .cast("int")
        .alias("n_chunk_tokens"),
    )


def hash_split(
    df: DataFrame,
    text_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment from a content-hash bucket in
    [0, 100). Content-keyed (not id-keyed) so re-ingested duplicates land in
    the SAME split — the property that prevents train/test contamination when
    the corpus is rebuilt. Adds ``bucket`` and ``split`` columns; stateless
    and shuffle-free."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = F.pmod(fingerprint_md5(text_col), F.lit(100))
    expr = None
    acc = 0
    # build CASE bucket < cum1 THEN s1 WHEN bucket < cum2 ... in dict order
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket.cast("int")).withColumn(
        "split", expr
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank documents inside each
    stratum by (rolling content hash, id) — a total order, so the sample is
    identical across runs and engines — and keep the first ``k``. One shuffle
    on the stratum key; with heavy skew pre-aggregate candidates per
    partition first (TakeOrdered-per-stratum) before the global window."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        fingerprint_md5(text_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag corpus documents that share any word ``n``-gram with a benchmark
    / evaluation set — the standard pre-training decontamination gate (docs
    overlapping an eval suite leak test answers into training).

    Adds ``n_contaminated_ngrams`` (distinct shared n-grams, long) and
    ``is_contaminated`` (boolean) to ``corpus``.

    Scale shape (the asymmetry is the whole design): eval suites are tiny
    next to a 100 TB corpus, so the benchmark side is distinct-reduced and
    BROADCAST — the corpus is never shuffled to meet it. The corpus-side
    n-gram explode is narrow (no exchange), the inner broadcast join emits
    only matching n-grams (rare by construction), so the per-doc count
    aggregates a sliver of the data. The final flag join is left as a plain
    equi-join: AQE broadcasts the hit list when it is small (the normal
    case) and falls back to a shuffle join only when contamination is
    rampant — which is exactly when a broadcast would OOM.

    Documents shorter than ``n`` tokens contribute their whole text as a
    single gram (``word_shingles`` semantics), so short eval items still
    match verbatim copies.
    """
    bench_ngrams = (
        benchmark.select(
            F.explode(word_shingles(bench_text_col or text_col, n)).alias("__ng")
        )
        .distinct()
    )
    doc_ngrams = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("__ng")
    )
    hits = (
        doc_ngrams.join(F.broadcast(bench_ngrams), "__ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_ngrams",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("long"),
        )
        .withColumn("is_contaminated", F.col("n_contaminated_ngrams") > 0)
    )


def budget_select(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budget: int,
    order_cols: list[str],
) -> DataFrame:
    """Keep documents, in caller-defined priority order inside each domain,
    until each domain hits its token ``budget`` — the mixture-construction
    step that turns per-domain weights into an actual document subset.

    ``order_cols`` MUST be a total order within each domain (append an id
    tiebreaker); otherwise the selected set varies run to run. A document
    whose exclusive running sum is still under the budget is kept even if
    it straddles the boundary (same keep-whole rule as ``pack_sequences``),
    so a domain yields at most ``budget + max_doc - 1`` tokens. Adds
    ``tokens_before`` (exclusive per-domain running sum) for auditability.

    One bounded window per domain — partitioned on ``domain_col``, never a
    global ORDER BY. Domains are few and fat at corpus scale; if a single
    domain outgrows one task's sort, pre-bucket it with the
    ``pack_sequences`` prefix-sum pattern instead.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(domain_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("tokens_before", running).where(
        F.col("tokens_before") < budget
    )


def pack_sequences(
    df: DataFrame,
    order_key: str,
    order_cols: list[str],
    token_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign chunks to fixed-token-budget packs: concatenate the token
    stream in (``order_cols``) order and cut every ``budget`` tokens WITHOUT
    splitting chunks — a chunk straddling a boundary belongs to the pack
    where it starts, so a pack holds at most ``budget + max_chunk - 1``
    tokens. Adds ``pack_id`` and ``pack_offset``.

    The global running offset is a distributed prefix-sum, NOT one global
    window (``Window.orderBy`` with no partition key funnels the whole
    dataset through a single task — the classic 100 TB killer):

    1. rows are fixed-width range-bucketed on numeric ``order_key``
       (deterministic, no sampling — unlike ``repartitionByRange``, whose
       sampled boundaries can shift between runs);
    2. each bucket computes its local exclusive cumsum (bounded window);
    3. per-bucket totals (``n_buckets`` rows) collect to the driver and
       fold into prefix offsets, broadcast back as a literal map.

    Skewed ``order_key`` distributions unbalance buckets but never break
    correctness or determinism; raise ``n_buckets`` to re-spread.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bounds = df.agg(
        F.min(order_key).alias("mn"), F.max(order_key).alias("mx")
    ).first()
    if bounds.mn is None:
        return df.withColumn("pack_id", F.lit(None).cast("long")).withColumn(
            "pack_offset", F.lit(None).cast("long")
        )
    mn, mx = int(bounds.mn), int(bounds.mx)
    width = max((mx - mn + n_buckets) // n_buckets, 1)
    bucket = ((F.col(order_key) - mn) / width).cast("long")

    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("__bucket", bucket).withColumn(
        "__local_off", F.coalesce(F.sum(token_col).over(w_local), F.lit(0)).cast("long")
    )

    totals = {
        r["__bucket"]: r["t"]
        for r in local.groupBy("__bucket")
        .agg(F.sum(token_col).cast("long").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    prefix_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(prefix.items()) for x in kv]
        ),
        F.col("__bucket"),
    )
    return (
        local.withColumn("__goff", prefix_expr + F.col("__local_off"))
        .withColumn("pack_id", (F.col("__goff") / budget).cast("long"))
        .withColumn("pack_offset", F.pmod(F.col("__goff"), F.lit(budget)).cast("long"))
        .drop("__bucket", "__local_off", "__goff")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum, fully
    deterministic (Efraimidis-Spirakis A-Res, public method): each row gets
    u_i in (0,1) from the engine-portable rolling hash of (seed, id) and
    sort key ln(u_i)/w_i; the top-k keys per stratum are exactly a
    probability-proportional-to-weight draw.

    Determinism policy: u_i comes from a hash, not rand() — rebuilds and
    repartitions can never change the sample; ln stays on INTEGER inputs
    (ln(h+1) - ln(M+1)) so the key is bit-identical in the DuckDB oracle.
    Scale shape: one narrow map + one top-k window per stratum.
    """
    from pyspark.sql import Window

    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
    )

    s = F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string"))
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)
        ),
    )
    wkey = (F.log(h + 1) - F.log(F.lit(float(ROLLING_HASH_MOD + 1)))) / F.col(
        weight_col
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__wkey").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__wkey", wkey)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
        .withColumn("sample_key", F.round(F.col("__wkey"), 6))
        .drop("__wkey")
    )


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    weights_ppm: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Training-mixture waterfilling: per-domain sampling rates that hit a
    target mixture under a total token budget.

    Given target weights (ppm) and the corpus's actual per-domain token
    counts, the ideal draw for domain d is ``lam * w_d`` tokens for one
    global scale ``lam``; domains with fewer tokens than their allocation
    SATURATE (rate 1) and their shortfall redistributes to the rest — the
    classic waterfilling solution, solved in closed form: sort domains by
    c_d = tokens_d / w_d ascending, find the cut where
    ``lam = (budget - saturated_tokens) / unsaturated_weight`` first falls
    below the next c_d. Per-domain totals are a k-row aggregate, so the
    solve is a driver scalar pass (k-state policy, like kmeans centroids);
    the RATES then drive a deterministic hash sample over the full corpus
    (``pmod(xxhash64(id), 1e6) < rate_ppm`` — no RNG, reproducible).

    Returns one row per domain: (domain, tokens, target_ppm, rate ∈ [0,1],
    planned_tokens = tokens * rate). Domains missing from ``weights_ppm``
    get rate 0. All arithmetic is IEEE double in a fixed expression order,
    reproducible in ANSI SQL (oracle-checked by asm_mixture_plan).
    """
    totals = {
        r["d"]: r["t"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    known = [
        (d, int(t), int(weights_ppm.get(d, 0))) for d, t in sorted(totals.items())
    ]
    pool = [(d, t, w) for d, t, w in known if w > 0]
    # closed-form waterfill over the ≤k weighted domains
    pool.sort(key=lambda x: (x[1] / x[2], x[0]))
    lam = None
    pre_tok = 0
    suf_w = sum(w for _, _, w in pool)
    for d, t, w in pool:
        cand = (budget_tokens - pre_tok) / suf_w
        if cand < t / w:  # this domain stays unsaturated at cand
            lam = cand
            break
        pre_tok += t
        suf_w -= w
    if lam is None:  # budget >= all weighted tokens: everything saturates
        lam = float(10**18)
    spark = df.sparkSession
    rows = []
    for d, t, w in known:
        rate = min(1.0, (lam * w) / t) if (w > 0 and t > 0) else 0.0
        rows.append((d, t, w, rate, t * rate))
    return spark.createDataFrame(
        rows, "domain string, tokens long, target_ppm long, rate double, planned_tokens double"
    )


def mixture_sample(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str,
    id_col: str,
) -> DataFrame:
    """Materialize a mixture_plan: keep each row iff its id hash falls
    under the domain's rate — deterministic, partition-independent, no
    RNG; the broadcast plan join adds no shuffle."""
    p = plan.select(
        F.col("domain").alias("__dom"),
        (F.col("rate") * 1_000_000).cast("long").alias("__rate_ppm"),
    )
    return (
        df.join(F.broadcast(p), F.col(domain_col) == F.col("__dom"))
        .where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000)) < F.col("__rate_ppm"))
        .drop("__dom", "__rate_ppm")
    )


def dsir_importance_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public method): score every document by how much its hashed-token
    profile looks like a TARGET domain relative to the full SOURCE
    corpus, w(d) = Σ_tok log p_tgt(bucket(tok)) / p_src(bucket(tok)),
    with add-one smoothing over ``n_buckets`` hashed unigram buckets.

    Engine-portable determinism: bucket = rolling-hash(token) mod B (ANSI
    arithmetic, not xxhash), the per-bucket log-ratio is built from ln on
    INTEGER inputs (bit-identical cross-engine) and FLOOR-quantized to
    integer micro-units, so the per-document total is an exact integer
    sum — immune to float summation order.

    Scale shape: explode -> ONE (doc, bucket) partial-agg shuffle; bucket
    marginals re-aggregate FROM that grouped frame (no second corpus
    scan — the frame is persisted across its two consumers); the B-row
    ratio table broadcasts; the final per-doc fold is a second partial
    agg. Returns (id, n_toks, dsir_micro) — micro-nats x 1e6; resample
    with asm_weighted_sample on the weight.

    Cache lifetime (same contract as ``incremental_dedup``): the grouped
    (doc, bucket) frame stays persisted until the SESSION drops it — it
    must outlive the returned lazy DataFrame, so this function cannot
    unpersist it. Long-lived sessions calling this per batch (e.g.
    pipelines/corpus.py curation with dsir_target_lang) should
    ``spark.catalog.clearCache()`` after materializing each batch's
    result, or the cached frames accumulate until LRU pressure.
    """
    from datagouvfr_data_pipelines_spark.session import fan_out

    # the per-token rolling-hash fold amplifies compute ~tokens-per-doc x;
    # fan past a narrow (single-row-group) scan before it runs. The fan
    # hashes on the doc id (round 12): explode preserves the partitioning
    # and HashPartitioning(id) satisfies the (id, __tgt, bkt) groupBy's
    # clustered distribution, so the fan exchange doubles as the groupBy
    # shuffle (and skips the keyless round-robin's local sort)
    tk = fan_out(docs.select(F.col(id_col), is_target.alias("__tgt"),
                             F.col(text_col)), id_col).select(
        F.col(id_col),
        "__tgt",
        F.explode(tokens(text_col)).alias("tok"),
    ).where(F.length("tok") > 0)
    g = (
        tk.select(
            id_col,
            "__tgt",
            F.pmod(fingerprint_rolling("tok"), F.lit(n_buckets)).alias("bkt"),
        )
        .groupBy(id_col, "__tgt", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    src = g.groupBy("bkt").agg(
        F.sum("n").alias("sc"),
        F.sum(F.when(F.col("__tgt"), F.col("n")).otherwise(0)).alias("tc"),
    )
    tot = src.agg(F.sum("sc").alias("s"), F.sum("tc").alias("t"))
    lr = (
        F.log(F.col("tc") + 1)
        - F.log(F.col("t") + n_buckets)
        - F.log(F.col("sc") + 1)
        + F.log(F.col("s") + n_buckets)
    )
    ratio = src.crossJoin(F.broadcast(tot)).select(
        "bkt", F.floor(lr * 1_000_000).cast("long").alias("lr_micro")
    )
    return (
        g.join(F.broadcast(ratio), "bkt")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_toks"),
            F.sum(F.col("n") * F.col("lr_micro")).alias("dsir_micro"),
        )
    )
