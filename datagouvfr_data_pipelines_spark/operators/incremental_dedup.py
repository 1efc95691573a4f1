"""Incremental corpus dedup: dedup a NEW ingest batch against the
fingerprint index of an already-curated corpus WITHOUT re-scanning the
corpus text.

At 100 TB the curated corpus is effectively immutable and far too large to
re-shingle on every ingest. The state kept between ingests is a compact
per-document index row — ``(doc, content_sha, sig, band_hashes)``, ~0.6 KB
per document (32 B sha + k x 8 B signature + bands x 8 B band keys) —
roughly 0.1% of the text it summarizes. Each ingest then:

1. builds index rows for the batch in ONE scan (shingle explode ->
   K-permutation signature aggregate, with the content sha carried through
   the same groupBy — no second scan, no id join);
2. drops exact dups: batch sha already present in the corpus index
   (shuffle semi-join on sha — store the index bucketed by ``content_sha``
   to make this co-located), or duplicated within the batch (min-id
   survivor);
3. drops near dups vs the corpus: LSH band-key equi-join against the
   corpus index (never all-pairs). The corpus side is FIRST pruned by a
   broadcast semi-join on the batch's band keys — only index rows whose
   band key occurs in the batch are ever shuffled — then hot buckets are
   capped (``max_bucket_size`` smallest doc ids) exactly like the batch
   LSH path. The verifier is the MinHash SIGNATURE AGREEMENT fraction
   (matching components / k): the standard text-free estimate of Jaccard
   at this state size (std-error ~1/sqrt(k) ~= 0.125 at k=64; banding
   already guarantees every candidate shares one full band);
4. drops near dups WITHIN the batch with the exact text verifier
   (``near_duplicate_pairs`` — the batch text is at hand), greedy
   keep-the-smaller-id edge rule (full connected-component collapse lives
   in pipelines/corpus.py for offline runs);
5. returns (survivors, survivor index rows to append, drop ledger with
   per-reason provenance — ``exact_corpus | exact_batch | near_corpus |
   near_batch``, earlier reasons take precedence).

Ref parity: the reference's consolidation re-reads its full prior output
every run to dedup against it (schema/utils/consolidation.py:54-76
download-all-then-concat); this operator replaces that with state that
grows with document COUNT, not corpus BYTES.
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.text import word_shingles
from datagouvfr_data_pipelines_spark.operators.dedup import (
    MERSENNE31,
    _fanned_text,
    _minhash_params,
    content_hash,
)


def _hashed_base(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    portable: bool,
) -> DataFrame:
    """One fanned pass over the text: (doc, content_sha, hv) with one row
    per exploded shingle. ``hv`` is the VERIFIER-grade shingle hash — the
    rolling fold (already mod 2^31-1) when portable, raw xxhash64
    otherwise — from which the minhash base hash derives as a cheap
    column op. Shared by ``build_dedup_index`` and (round 13)
    ``incremental_dedup``'s exact-Jaccard verifier, so the
    tokenize + shingle + per-char hash pipeline runs ONCE per batch."""
    base = _fanned_text(df, id_col, text_col).select(
        F.col(id_col).alias("doc"),
        content_hash(text_col).alias("content_sha"),
        F.explode_outer(word_shingles(text_col, shingle_n)).alias("s"),
    )
    if portable:
        from datagouvfr_data_pipelines_spark.functions.text import (
            ROLLING_HASH_BASE,
            ROLLING_HASH_MOD,
        )

        hv = F.aggregate(
            F.transform(F.split(F.col("s"), ""), lambda ch: F.ascii(ch).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)),
        )
    else:
        hv = F.xxhash64("s")
    return base.select("doc", "content_sha", hv.alias("hv"))


def build_dedup_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    portable: bool = False,
    base: DataFrame | None = None,
) -> DataFrame:
    """Per-document dedup fingerprints: (doc, content_sha, sig, band_hashes).

    One scan: explode_outer(shingles) keeps zero-shingle documents (their
    sha still participates in exact dedup) -> base xxhash per shingle ->
    K min-aggregates grouped by doc -> signature array + per-band hashes.
    The sha rides along as a ``first()`` aggregate, NOT a group key: it is
    constant within the group, and keying on the 64-char string would hash
    it per exploded shingle (measured ~4.5x slower at 5k docs). Documents
    with no shingles get NULL sig/band_hashes and are excluded from the
    LSH path (two whitespace-only docs must match via their sha, never
    via a hash of an all-null signature).

    ``portable=True`` swaps the shingle hash and band keys for the
    ANSI-arithmetic forms of ``near_duplicate_pairs(portable=True)`` so
    the whole index — and every decision derived from it — reproduces in
    a DuckDB oracle. Portable and xxhash indexes are INCOMPARABLE; an
    index must be rebuilt, not mixed.

    ``base`` (round 13): a pre-built ``_hashed_base`` frame (possibly
    persisted) to aggregate from instead of re-deriving the shingle
    pipeline — callers that also need the verifier hash sets (the
    incremental full cascade) share one text pass this way. Must have
    been built with the same (shingle_n, portable).
    """
    rows = k // bands
    if base is None:
        base = _hashed_base(df, id_col, text_col, shingle_n, portable)
    # portable hv is already the mod-2^31-1 rolling value; the xxhash
    # verifier hash is raw 64-bit, folded into the minhash domain here
    # (identical to the historical pmod(xxhash64(s), M) column).
    h = F.col("hv") if portable else F.pmod(F.col("hv"), F.lit(MERSENNE31))
    base = base.select("doc", "content_sha", h.alias("h"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(_minhash_params(k, seed))
    ]
    agged = base.groupBy("doc").agg(
        F.first("content_sha").alias("content_sha"), *aggs
    )
    sig_arr = F.array(*[F.col(f"m{i}") for i in range(k)])
    if portable:
        band_arr = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.aggregate(
                F.slice(sig_arr, b * rows + 1, rows),
                F.lit(0).cast("long"),
                lambda acc, x: F.pmod(acc * 131 + x, F.lit(MERSENNE31)),
            ),
        )
    else:
        band_arr = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(F.slice(sig_arr, b * rows + 1, rows)).cast("long"),
        )
    has_sig = F.col("m0").isNotNull()
    return agged.select(
        "doc",
        "content_sha",
        F.when(has_sig, sig_arr).alias("sig"),
        F.when(has_sig, band_arr).alias("band_hashes"),
    )


class IncrementalDedupResult(NamedTuple):
    survivors: DataFrame  # batch rows that enter the corpus
    index_rows: DataFrame  # their fingerprints, to append to the index
    ledger: DataFrame  # (doc, reason) for every dropped batch doc


def incremental_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int = 64,
    seed: int = 42,
    portable: bool = False,
) -> IncrementalDedupResult:
    """Dedup ``batch`` against ``index`` (see module docstring).

    ``index`` must have the ``build_dedup_index`` schema and the SAME
    (k, bands, shingle_n, seed, portable) — signatures from different
    parameters are incomparable. The batch fingerprint projection is
    persisted around its four consumers (exact join, band join, agreement
    verify, ledger); callers stream-ingesting forever should clearCache()
    between batches.
    """
    # NOTE (round 13, measured): sharing one persisted ``_hashed_base``
    # between bidx and the verifier's shingle sets (one text pass instead
    # of two) was A/B-measured a small LOSS at sf0.1 (+0.15 s over 3
    # interleaved rounds): caching the EXPLODED shingle rows costs more
    # than recomputing the fused scan->explode->hash->partial-agg stage,
    # whose per-char hash is cheap warm (OPTIMIZATION_r12.md hypothesis
    # #1). Kept as two passes.
    bidx = build_dedup_index(
        batch,
        id_col,
        text_col,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        seed=seed,
        portable=portable,
    ).persist()

    # -- exact tier ---------------------------------------------------------
    # Two equivalent forms, chosen by which tiers will run (both A/B
    # measured; the sorted-set aggregate is an ObjectHashAggregate that
    # only pays off when the near tiers contend for bidx too):
    # - exact-only ingest (threshold > 1: both near verifiers are
    #   unsatisfiable, skip their pipelines outright): min-keep groupBy +
    #   joins back to bidx — the join exchanges reuse bidx's, and the
    #   primitive min aggregate is cheaper than a collected doc set.
    # - full cascade: ONE sha groupBy with the sorted doc set serves both
    #   exact tiers (semi-join + explode; all-but-min explode) — two bidx
    #   joins disappear. Null shas are excluded up front — the join-on-sha
    #   form dropped them via null-unsafe equality.
    if threshold > 1.0:
        exact_corpus = bidx.join(
            index.select("content_sha").distinct(), "content_sha", "leftsemi"
        ).select("doc")
        intra_keep = bidx.groupBy("content_sha").agg(F.min("doc").alias("__keep"))
        exact_batch = (
            bidx.join(intra_keep, "content_sha")
            .where(F.col("doc") != F.col("__keep"))
            .select("doc")
        )
        empty = bidx.select("doc").where(F.lit(False))
        return _combine(
            batch, bidx, id_col, exact_corpus, exact_batch, empty, empty
        )

    shas = (
        bidx.where(F.col("content_sha").isNotNull())
        .groupBy("content_sha")
        .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
    )
    exact_corpus = shas.join(
        index.select("content_sha").distinct(), "content_sha", "leftsemi"
    ).select(F.explode("docs").alias("doc"))
    # every doc in a sha group except the smallest id (the min-keep rule)
    exact_batch = shas.select(
        F.explode(
            F.slice("docs", 2, F.greatest(F.size("docs") - 1, F.lit(0)))
        ).alias("doc")
    )

    # -- near tiers ---------------------------------------------------------

    b_bands = bidx.where(F.col("band_hashes").isNotNull()).select(
        "doc", F.posexplode("band_hashes").alias("band", "bh")
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig", "csig", lambda x, y: x == y), lambda eq: eq
        )
    )
    # ONE (band, bh) aggregate of the batch's exploded band keys serves
    # both the corpus-pruning key set and the within-batch buckets
    # (previously bkeys.distinct() and nb_buckets' groupBy shuffled the
    # same frame twice).
    buckets_all = b_bands.groupBy("band", "bh").agg(
        F.sort_array(F.collect_set("doc")).alias("docs")
    )
    bkeys = buckets_all.select("band", "bh")
    c_bands = index.where(F.col("band_hashes").isNotNull()).select(
        F.col("doc").alias("cdoc"),
        F.col("sig").alias("csig"),
        F.posexplode("band_hashes").alias("band", "bh"),
    )
    # broadcast the batch's band keys so only matching corpus index
    # rows are shuffled; cap hot buckets to the smallest
    # max_bucket_size ids. The capped struct carries the corpus
    # SIGNATURE alongside the id: the agreement verifier then never
    # joins back to the full index — the only corpus signatures that
    # ever move are the band-matched, capped ones. sort_array orders
    # structs by cdoc (unique per bucket: one bh per doc per band),
    # so the surviving id set is identical to the bare-cdoc form.
    capped = (
        c_bands.join(F.broadcast(bkeys), ["band", "bh"])
        .groupBy("band", "bh")
        .agg(
            F.slice(
                F.sort_array(F.collect_set(F.struct("cdoc", "csig"))),
                1,
                max_bucket_size,
            ).alias("cands")
        )
    )
    # buckets_all and capped are both hash-partitioned on (band, bh)
    # by their aggregates, so this join adds no exchange. Duplicate
    # (doc, cdoc) pairs across bands re-run only the cheap per-pair
    # zip_with — the final distinct on doc is unchanged.
    near_corpus = (
        buckets_all.join(capped, ["band", "bh"])
        .select(F.explode("docs").alias("doc"), "cands")
        .select("doc", F.explode("cands").alias("c"))
        .select("doc", F.col("c.csig").alias("csig"))
        .join(bidx.select("doc", "sig"), "doc")
        .where(agree >= F.lit(int(threshold * k)))
        .select("doc")
        .distinct()
    )

    # -- near tier within batch (exact text verify) -------------------------
    # Round 12: candidates come from the PERSISTED batch index instead of
    # re-running the full minhash pipeline over the batch text
    # (near_duplicate_pairs re-derived shingles, the K-permutation
    # signature aggregate and the band keys — all already in ``bidx``, by
    # the same hash family, so the band buckets are identical). Only the
    # exact-Jaccard verifier still needs the hashed shingle SETS, which
    # the compact index deliberately does not store: one fanned shingle
    # projection over the batch text, persisted around its two join sides.
    from pyspark import StorageLevel

    ft = _fanned_text(batch, id_col, text_col)
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

        sh = ft.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(
                F.transform(word_shingles(text_col, shingle_n), _rolling)
            ).alias("sh"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        sh = ft.select(
            F.col(id_col).alias("doc"),
            F.transform(
                word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    # same grouped frame as the corpus-pruning keys — shared exchange
    nb_buckets = buckets_all.where(
        (F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size)
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
    nb_pairs = (
        nb_buckets.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    denom = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(denom == 0.0, F.lit(0.0)).otherwise(inter / denom)
    near_batch = (
        nb_pairs.join(
            sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .where(jac >= threshold)
        .select(F.col("id_b").alias("doc"))
        .distinct()
    )

    return _combine(
        batch, bidx, id_col, exact_corpus, exact_batch, near_corpus, near_batch
    )


def _combine(
    batch: DataFrame,
    bidx: DataFrame,
    id_col: str,
    exact_corpus: DataFrame,
    exact_batch: DataFrame,
    near_corpus: DataFrame,
    near_batch: DataFrame,
) -> IncrementalDedupResult:
    """Union the drop sets with reason precedence; derive survivors/index."""
    reasons = [
        (exact_corpus, "exact_corpus"),
        (exact_batch, "exact_batch"),
        (near_corpus, "near_corpus"),
        (near_batch, "near_batch"),
    ]
    tagged = None
    for dframe, reason in reasons:
        t = dframe.select("doc", F.lit(reason).alias("reason"))
        tagged = t if tagged is None else tagged.unionByName(t)
    pri = F.array_position(
        F.array(*[F.lit(r) for _, r in reasons]), F.col("reason")
    )
    ledger = (
        tagged.groupBy("doc")
        .agg(F.min_by("reason", pri).alias("reason"))
    )
    dropped = ledger.select(F.col("doc").alias("__dropped_id"))
    survivors = batch.join(
        dropped, F.col(id_col) == F.col("__dropped_id"), "left_anti"
    )
    index_rows = bidx.join(
        dropped, F.col("doc") == F.col("__dropped_id"), "left_anti"
    )
    return IncrementalDedupResult(survivors, index_rows, ledger)
