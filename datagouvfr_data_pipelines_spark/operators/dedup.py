"""Deduplication operators for the training-data pipeline.

Four tiers, all Spark-first:

- exact:   sha256 content hash -> groupBy -> keep min id. One shuffle on the
           hash; at 100 TB this is the cheapest full-corpus dedup.
- minhash: word-shingle MinHash signatures (K permutations) computed with
           higher-order array functions (NO Python UDF), LSH banding ->
           candidate pairs via band-key self-join -> exact Jaccard verify on
           the shingle sets. Shuffles: one on band keys (bounded by B x docs),
           one to verify. This is the scalable near-dup path: cost is
           O(docs x K) map-side + candidate-pair verify, never O(docs^2).
- simhash: 64-bit sign-aggregated token-hash fingerprint via explode +
           conditional bit sums; near-dups = equal fingerprint (or banded
           Hamming at scale).
- ngram-jaccard: exact pairwise verify kernel used by the LSH candidates (and
           usable on its own for small candidate sets).
- containment: shared-shingle inverted index (capped buckets + shared-count
           floor) -> |A∩B|/min(|A|,|B|) verify — the quote-inclusion tier
           MinHash banding is structurally blind to (P(candidate) =
           Jaccard^rows, and contained pairs have low Jaccard).

MinHash math: h_k(s) = (a_k * (xxhash64(s) mod M) + b_k) mod M with
M = 2^31 - 1; a_k, b_k from a fixed seeded PRNG so signatures are stable
across runs/partitions.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from datagouvfr_data_pipelines_spark.functions.text import word_shingles

MERSENNE31 = 2_147_483_647


def _fanned_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Narrow (id, text) projection fanned past scan granularity.

    Every operator below funnels text into a compute-heavy
    shingle/token explode whose parallelism is otherwise pinned to the
    scan's row-group count — a single-file corpus sample runs the whole
    hash pipeline in one task (the nearest_neighbor_join lesson).
    session.fan_out is a no-op once the scan already fans wide, so this
    is safe to keep in the 100 TB path.

    The fan hashes on ``id_col`` (round 12): the signature aggregates
    downstream all group by the document id, so a hash exchange on the id
    doubles as their groupBy shuffle — explode and per-shingle hashing
    preserve the partitioning, EnsureRequirements sees the clustered
    distribution already satisfied, and the separate signature exchange
    (plus the local sort a keyless round-robin repartition pays,
    SPARK-23207) disappears. Per-partition balance is bounded by document
    size — one document never spans partitions, which is exactly the
    granularity the group-by needs."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    return fan_out(df.select(id_col, text_col), id_col)


def content_hash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.lower(F.trim(F.regexp_replace(c, "\\s+", " "))), 256)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: one survivor (min id) per normalized-content hash."""
    return (
        df.select(F.col(id_col), content_hash(text_col).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31)) for _ in range(k)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """K-permutation MinHash signatures: (doc, sig array<long>).

    Implemented as explode(shingles) -> one base xxhash per shingle -> K
    ``min(pmod(a*h+b))`` aggregate columns -> array reassembly. The exploded
    form costs one shuffle on the doc id but keeps every permutation a flat
    aggregate over a single precomputed hash column — unlike a nested
    K x shingles expression tree, which recomputes shingles per permutation
    and blows past codegen limits (measured: >100x slower at 5k docs).
    Map-side partial aggregation keeps the shuffle at K longs per doc.
    """
    df = _fanned_text(df, id_col, text_col)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, shingle_n)).alias("sh"),
    ).select("doc", F.pmod(F.xxhash64("sh"), F.lit(MERSENNE31)).alias("h"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_params(k, seed))
    ]
    sig = base.groupBy("doc").agg(*aggs)
    return sig.select("doc", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures with an ENGINE-PORTABLE shingle hash — the
    oracle-checkable variant of ``minhash_signatures``.

    The production path hashes shingles with xxhash64 (fast, JVM-side) which
    no SQL oracle can reproduce; this variant uses the polynomial rolling
    hash (acc*131 + codepoint mod 2^31-1, same as ``fingerprint_rolling``)
    so the ENTIRE signature computation — shingling, hashing, K permutation
    minima — is reproducible in ANSI SQL (DuckDB list_reduce/list_transform)
    and the driver gate can hash-compare it. Signatures come back as K
    scalar columns m0..m{k-1} (canonicalizable, no array outputs).

    Per-row array folds (interpreted) instead of explode+agg: right for the
    verification-sized k; the production pipeline keeps the exploded
    codegen'd form.
    """
    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
    )

    def rolling(s):
        codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)),
        )

    hs = F.transform(word_shingles(text_col, shingle_n), rolling)
    params = _minhash_params(k, seed)

    def sig_struct(arr):
        # arr bound once per row; 16 permutation minima over the hash list
        return F.struct(
            *[
                F.array_min(
                    F.transform(
                        arr, lambda v: F.pmod(F.lit(a) * v + F.lit(b), F.lit(MERSENNE31))
                    )
                ).alias(f"m{i}")
                for i, (a, b) in enumerate(params)
            ]
        )

    sig = F.transform(F.array(hs), sig_struct)[0]
    return df.select(
        F.col(id_col), *[sig[f"m{i}"].alias(f"m{i}") for i in range(k)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding (id_a < id_b, distinct).

    Two docs are candidates iff at least one of their ``bands`` band-hashes
    collide. Instead of a raw self-join on band keys (quadratic when buckets
    are hot), buckets are materialized via groupBy and pairs are generated
    bucket-locally; buckets larger than ``max_bucket_size`` are dropped —
    they correspond to near-universal content whose pairs would dominate
    cost while being poor near-dup candidates. This cap is the standard
    large-corpus LSH guardrail: without it a single boilerplate-heavy bucket
    makes the candidate set O(n^2) at 100 TB.
    """
    rows = k // bands
    sig = minhash_signatures(df, id_col, text_col, k=k, shingle_n=shingle_n)
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.hash(F.slice(F.col("sig"), b * rows + 1, rows)).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bh")
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size))
    )
    # bucket-local pair expansion: for each i, pair with every later element
    pairs_arr = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs; keep >= threshold."""
    sh = df.select(
        F.col(id_col).alias("__sid"), word_shingles(text_col, shingle_n).alias("__sh")
    )
    a = sh.select(F.col("__sid").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col("__sid").alias("id_b"), F.col("__sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union == 0.0, F.lit(0.0)).otherwise(inter / union)
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def near_duplicate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int = 64,
    broadcast_candidates: bool = False,
    portable: bool = False,
    metric: str = "jaccard",
) -> DataFrame:
    """End-to-end MinHash near-dup pipeline computing shingles ONCE.

    ``metric`` picks the verify score: ``"jaccard"`` (|A∩B|/|A∪B|, the
    symmetric near-dup test) or ``"containment"`` (|A∩B|/min(|A|,|B|) —
    fires when EITHER document's shingle set is mostly inside the other,
    the quote-inclusion / subset-duplicate test that Jaccard misses when
    one document is much longer). Same candidate generation either way;
    only the verify expression and the output column name change.

    ``minhash_lsh_candidates`` + ``jaccard_verify`` each derive shingles
    from raw text; at corpus scale the shingle projection is the dominant
    map cost, so this fused variant materializes (id, shingles) a single
    time and feeds both the signature/banding path and the exact-Jaccard
    verify join. Returns (id_a, id_b, jaccard >= threshold).

    The shared projection is ``persist()``-ed (MEMORY_AND_DISK): without it
    Catalyst re-evaluates the shingle regex/zip work three times — once for
    the signature branch and once per verify-join side — tripling the
    dominant map stage. The cache is scoped to this plan's lifetime; callers
    running in a long-lived session can ``spark.catalog.clearCache()`` after
    materializing the result (Spark otherwise evicts LRU).

    Shingles are hashed to 64-bit longs (xxhash64) BEFORE caching: the
    signature permutations need only the hash, and Jaccard on distinct
    hashed shingles equals string-shingle Jaccard up to 64-bit collisions
    (~n²/2⁶⁴ — negligible at any corpus size), while the cached arrays and
    the verify-join intersections operate on fixed-width longs instead of
    repeated text.

    ``portable=True`` swaps BOTH hashes for ANSI-arithmetic forms — the
    polynomial rolling shingle hash (fingerprint_rolling algebra, mod
    2^31-1) and a rolling fold over each signature band instead of
    ``F.hash`` — so the ENTIRE pipeline (shingle→signature→band→candidate
    →exact-Jaccard verify) is reproducible in a DuckDB oracle. Same plan
    shape and scale behavior (hash cost is a per-shingle column fold
    either way); collision space shrinks to 2^31, which only adds
    candidates that the exact verify then filters — recall is unaffected,
    precision is restored by the verify stage.
    """
    from pyspark import StorageLevel

    df = _fanned_text(df, id_col, text_col)
    if portable:
        from datagouvfr_data_pipelines_spark.functions.text import (
            ROLLING_HASH_BASE,
            ROLLING_HASH_MOD,
        )

        def _rolling(s):
            codes = F.transform(
                F.split(s, ""), lambda ch: F.ascii(ch).cast("long")
            )
            return F.aggregate(
                codes,
                F.lit(0).cast("long"),
                lambda acc, x: F.pmod(
                    acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)
                ),
            )

        sh = df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(
                F.transform(word_shingles(text_col, shingle_n), _rolling)
            ).alias("sh"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base = sh.select("doc", F.explode("sh").alias("h"))
    else:
        sh = df.select(
            F.col(id_col).alias("doc"),
            F.transform(
                word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base = sh.select("doc", F.explode("sh").alias("s")).select(
            "doc", F.pmod(F.col("s"), F.lit(MERSENNE31)).alias("h")
        )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_params(k))
    ]
    sig = base.groupBy("doc").agg(*aggs).select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )
    rows = k // bands

    def _band_key(b):
        sl = F.slice(F.col("sig"), b * rows + 1, rows)
        if portable:
            return F.aggregate(
                sl,
                F.lit(0).cast("long"),
                lambda acc, x: F.pmod(acc * 131 + x, F.lit(MERSENNE31)),
            )
        return F.hash(sl).cast("long")

    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    _band_key(b).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bh")
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # broadcast_candidates: with AQE the runtime broadcasts a small candidate
    # set on its own; without it (static planning can't size a derived
    # aggregate) the verify joins fall back to sort-merge, shuffling the
    # shingle projection twice. Callers who KNOW the candidate set is small
    # (bounded buckets x max_bucket_size) opt in; default stays safe for
    # corpora where candidates may exceed driver memory.
    if broadcast_candidates:
        pairs = F.broadcast(pairs)
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    if metric == "containment":
        denom = F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
        out_col = "containment"
    elif metric == "jaccard":
        denom = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        out_col = "jaccard"
    else:
        raise ValueError(f"unknown metric {metric!r}")
    score = F.when(denom == 0.0, F.lit(0.0)).otherwise(inter / denom)
    return joined.select("id_a", "id_b", score.alias(out_col)).where(
        F.col(out_col) >= threshold
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket_size: int = 256,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs via banded Hamming search.

    Pigeonhole: two 64-bit fingerprints within Hamming distance d must share
    at least one of ``bands`` contiguous 16-bit bands when d < bands. So:
    band the fingerprints (one shuffle), pair bucket-locally, verify with
    ``bit_count(xor) <= max_hamming``. Same candidate-bounding shape as the
    MinHash LSH path — no O(n²) scan.

    The pigeonhole guarantee needs bands > max_hamming (d differing bits
    can touch at most d bands, so one band survives untouched only then).
    With ``bands=None`` (default) the smallest sound divisor of the
    fingerprint width is chosen automatically; an EXPLICIT unsound
    ``bands`` raises ValueError rather than silently losing recall.

    ``portable=True`` fingerprints with the 31-bit rolling-hash SimHash
    (``simhash31_exploded`` — same explode/partial-agg plan shape, ANSI
    arithmetic) banded over a 32-bit width, so the whole search is
    reproducible in a DuckDB oracle.
    """
    if portable:
        fp = simhash31_exploded(df, id_col, text_col)
        return banded_hamming_pairs(
            fp,
            "doc",
            "simhash31",
            max_hamming=max_hamming,
            bands=bands,
            max_bucket_size=max_bucket_size,
            width_bits=32,
        )
    fp = simhash64(df, id_col, text_col)
    return banded_hamming_pairs(
        fp,
        "doc",
        "simhash",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )


def banded_hamming_pairs(
    fp: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket_size: int = 256,
    width_bits: int = 64,
) -> DataFrame:
    """Generic banded-Hamming near-dup pairing over any fixed-width
    fingerprint column (SimHash text fingerprints, image dHash, audio
    chromaprints…) — ``width_bits`` wide (default 64).

    Same pigeonhole machinery as ``simhash_neardup_pairs`` (which
    delegates here): band the signature, pair bucket-locally under a size
    cap, verify ``bit_count(xor) <= max_hamming``. One shuffle on the
    (band, band-hash) key — never O(n²) in the table.
    """
    if bands is None:
        bands = next(
            b
            for b in (1, 2, 4, 8, 16, 32, 64)
            if b > max_hamming and width_bits % b == 0
        )
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}): the "
            "banded pigeonhole search only guarantees recall when at least "
            "one band is untouched by the differing bits; raise bands or "
            "lower max_hamming (or pass bands=None to auto-size)"
        )
    if width_bits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide {width_bits}")
    width = width_bits // bands
    mask = (1 << width) - 1
    banded = fp.select(
        F.col(id_col).alias("doc"),
        F.col(sig_col).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(sig_col), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sig", "bk.band", "bk.bh")
    buckets = (
        banded.groupBy("band", "bh")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("doc"), F.col("sig")))
            ).alias("ds")
        )
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket_size))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc"].alias("id_a"),
                    y["doc"].alias("id_b"),
                    F.bit_count(x["sig"].bitwiseXOR(y["sig"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash31_portable(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash with an engine-portable token hash — the oracle-checkable
    twin of ``simhash64`` (same sign-sum construction, rolling 31-bit hash
    instead of xxhash64, so every bit is reproducible in ANSI SQL).

    Per-row bound-lambda fold (the verification path); the production
    ``simhash64`` keeps the exploded codegen'd aggregation. Returns
    (id, simhash31 bigint).
    """
    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        tokens,
    )

    def rolling(s):
        codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)),
        )

    hs = F.transform(tokens(text_col), rolling)

    def _bit_step(b):
        # closure factory: a default-arg lambda would surface as a third
        # lambda parameter to F.aggregate and get bound to a Column
        return lambda acc, v: acc + F.when(
            F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    def fp(arr):
        out = F.lit(0).cast("long")
        for b in range(31):
            bit_sum = F.aggregate(arr, F.lit(0).cast("long"), _bit_step(b))
            out = out + F.when(bit_sum > 0, F.lit(1 << b).cast("long")).otherwise(0)
        return out

    sim = F.transform(F.array(hs), fp)[0]
    return df.select(F.col(id_col), sim.alias("simhash31"))


def simhash31_exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """31-bit portable SimHash in the PRODUCTION plan shape: explode(tokens)
    -> rolling-hash column fold per token -> 31 conditional partial-agg bit
    sums -> bit reassembly. Same algebra as ``simhash31_portable`` (per-row
    fold, verification path) — parity is test-pinned — but the map-side
    combiner keeps the shuffle at one row per (doc, 31 sums), the shape
    that holds at corpus scale."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        tokens,
    )

    tok = _fanned_text(df, id_col, text_col).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tk")
    ).withColumn(
        "h",
        F.aggregate(
            F.transform(F.split(F.col("tk"), ""), lambda ch: F.ascii(ch).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)),
        ),
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(31)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for i in range(31):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return agg.select("doc", fp.alias("simhash31"))


ROLLING_HASH_BASE2 = 137  # second independent base for the 62-bit stack


def simhash62_exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """62-bit ENGINE-PORTABLE SimHash, production plan shape: each token is
    hashed by TWO independent polynomial rolling hashes (bases 131 and 137,
    both mod 2^31-1) stacked into one 62-bit value (h1 | h2 << 31), then
    explode -> 62 conditional partial-agg bit sums -> reassembly. Doubles
    the ``simhash31_exploded`` bit budget to the 64-bit class the xxhash64
    production path targets, while every bit stays reproducible in ANSI
    SQL (two list_reduce folds per token)."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        tokens,
    )

    def _fold(base):
        return F.aggregate(
            F.transform(F.split(F.col("tk"), ""), lambda ch: F.ascii(ch).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * base + x, F.lit(ROLLING_HASH_MOD)),
        )

    tok = (
        _fanned_text(df, id_col, text_col)
        .select(
            F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tk")
        )
        .withColumn(
            "h",
            _fold(ROLLING_HASH_BASE)
            + _fold(ROLLING_HASH_BASE2) * F.lit(1 << 31).cast("long"),
        )
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(62)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for i in range(62):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return agg.select("doc", fp.alias("simhash62"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits.

    Implemented as explode(tokens) -> 64 conditional sums -> bit reassembly:
    one shuffle on the doc id with map-side partial aggregation. At corpus
    scale prefer this over per-row 64-element arrays — the agg combiner keeps
    the shuffle small.
    """
    from datagouvfr_data_pipelines_spark.functions.text import tokens

    tok = _fanned_text(df, id_col, text_col).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tk")
    ).withColumn("h", F.xxhash64("tk"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")).otherwise(0)
    return agg.select("doc", fp.alias("simhash"))


def minhash_merge_states(states: list[DataFrame], id_col: str = "doc") -> DataFrame:
    """Merge per-batch MinHash signatures: MinHash is a MERGEABLE sketch —
    the signature of A ∪ B is the elementwise minimum of the signatures,
    exactly (min is associative/commutative per permutation slot).

    This is the incremental path for near-dup index maintenance at
    100 TB: sign each ingest batch with ``minhash_signatures`` (touching
    only new/changed docs), persist the per-doc states, and fold batches
    with one groupBy + zip_with(min) here — the LSH banding then runs on
    merged signatures without ever rescanning historical text. Same
    mergeable-state discipline as ``aggregates.partial_agg_states`` and
    the HLL tier (operators/sketches.py); merge == direct is pinned by
    test (tests/test_custom_ops.py::test_minhash_merge_equals_direct).
    """
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(F.col(id_col).alias("doc")).agg(
        F.reduce(
            F.collect_list("sig"),
            F.lit(None).cast("array<bigint>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b: F.least(a, b))
            ),
        ).alias("sig")
    )


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int = 64,
    broadcast_candidates: bool = False,
    portable: bool = False,
    min_shared: int = 2,
) -> DataFrame:
    """Containment (quote-inclusion) near-dup pairs via a shared-shingle
    inverted index — NOT MinHash LSH, deliberately.

    ``min_shared``: a candidate pair must share at least this many
    indexed (cap-admitted) shingles. Any containment >= 0.6 over >= 4
    shingles forces multiple shared shingles, so 2 is recall-safe except
    for degenerate 1-3-shingle documents (set 1 to keep those); the pair
    count aggregate replaces a distinct at the SAME shuffle cost but
    map-side combines, and measured on the sf0.1 corpus it cuts the
    candidate set 10x (1.13M -> 112k) and verify wall 4x with an
    identical final pair set.

    ``portable=False`` (default) hashes shingles with xxhash64 — the fast
    JVM production path (measured ~3x the per-character rolling fold on
    the sf0.1 corpus). ``portable=True`` swaps in the rolling polynomial
    hash so the whole pipeline reproduces in a DuckDB oracle; candidates
    differ only by hash-collision noise that the exact verify filters.

    ``broadcast_candidates`` is opt-in like ``near_duplicate_pairs``: at
    corpus scale the candidate set can exceed driver memory, so only
    callers who KNOW it's bounded (capped buckets x cap²) should force
    the broadcast; default lets AQE size it at runtime.

    MinHash banding surfaces a pair with probability Jaccard^rows per
    band, and a short document quoted inside a much longer one has LOW
    Jaccard by construction (|A∩B|/|A∪B| ~ |A|/|B|), so LSH candidate
    generation is structurally blind to exactly the pairs containment is
    for. The classic fix (Broder's supershingles / LSH-Ensemble) indexes
    shingles directly: two documents become candidates when they share
    ANY indexed shingle whose corpus frequency is within
    ``max_bucket_size`` (the cap drops boilerplate shingles that would
    pair everything with everything — same role as the LSH bucket cap;
    a contained quote of >= shingle_n words shares a RARE shingle with
    its source essentially always, so recall survives the cap).

    Scale: one explode+groupBy on the 31-bit shingle hash (map-side
    combinable), pair expansion only inside capped buckets —
    O(docs x shingles + buckets x cap²) — then a verify join that touches
    candidates only. Returns (id_a, id_b, containment >= threshold) with
    containment = |A∩B|/min(|A|,|B|).

    The shared (id, hashed-shingle-set) projection is persisted across
    the index and verify branches (same lifetime note as
    ``near_duplicate_pairs``).
    """
    from pyspark import StorageLevel

    from datagouvfr_data_pipelines_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
    )

    def _rolling(s):
        codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(
                acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)
            ),
        )

    hash_fn = _rolling if portable else (lambda s: F.xxhash64(s))
    sh = _fanned_text(df, id_col, text_col).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.transform(word_shingles(text_col, shingle_n), hash_fn)
        ).alias("sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    inv = sh.select("doc", F.explode("sh").alias("h"))
    buckets = (
        inv.groupBy("h")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= min_shared)
        .select("id_a", "id_b")
    )
    if broadcast_candidates:
        pairs = F.broadcast(pairs)
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    denom = F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
    score = F.when(denom == 0.0, F.lit(0.0)).otherwise(inter / denom)
    return joined.select("id_a", "id_b", score.alias("containment")).where(
        F.col("containment") >= threshold
    )
