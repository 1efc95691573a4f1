"""Incremental SemDeDup: dedup an embedding batch against a corpus index.

The embedding twin of ``operators/incremental_dedup.py`` (which covers the
exact-sha and MinHash text tiers): a 100 TB training-data pipeline ingests
embeddings continuously, and re-running full-corpus SemDeDup
(functions/similarity.py:semantic_dedup, Abbas et al. 2023) per ingest is
O(corpus) per batch. Here the only cross-batch state is a compact
per-vector index — (doc, cell, vec, nrm, c_sim), the ``semantic_base``
projection — so per-batch cost is proportional to the BATCH plus the
corpus members of the batch's cells:

- corpus tier (``near_corpus``): a batch vector is dropped when ANY
  already-ingested vector in its cell has cosine >= threshold. The corpus
  is immutable, so corpus always wins — there is no keep-farthest choice
  between a new vector and an indexed one (mirrors the exact-corpus
  precedence of incremental_dedup).
- batch tier (``near_batch``): plain ``semantic_dedup`` within the batch —
  keep-farthest-from-centroid, ties keep the smaller id.
- precedence: near_corpus > near_batch (a doc dropped by the corpus never
  reaches the batch ledger); survivors' index rows are what the caller
  appends to the index (streaming/semantic_stream.py does this with the
  same atomic-swap + watermark machinery as the text tier).

Scale shape: the corpus side is pruned FIRST by a broadcast of the
batch's distinct cell keys (the batch is bounded, its cell set more so),
then capped — corpus cells larger than ``max_cell_size`` skip the
comparison entirely with the batch member KEPT (keeping a duplicate is
safe; dropping on partial evidence is not — same guardrail as
``semantic_dedup``). The batch-vs-corpus cosines run in one Arrow-batched
per-cell kernel (round 12; bit-exact sequential-order dots, see
``similarity._seq_dots_block``) — O(rows·dim) vectors shipped once
instead of the old salt-sliced O(pairs·dim) interpreted-fold join.

Centroids are a PARAMETER and must stay frozen across batches (the
SemDeDup recipe: train k-means on a sample once, assign forever) —
re-training would silently re-shuffle cell assignments and make the index
incomparable with new batches, the same contract as incremental_dedup's
"signatures from different parameters are incomparable".
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.similarity import (
    semantic_assign_scaled,
    semantic_base,
    semantic_dedup,
    semantic_dedup_scaled,
)


def build_semantic_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """Per-vector index rows: (doc, cell, vec, nrm, c_sim).

    One narrow projection (``semantic_base``) — cell assignment, norm and
    own-centroid cosine are computed once here and never re-derived, so a
    vector's index row is bit-stable for the lifetime of the index.

    The input is fanned on ``id_col`` first (session.fan_out, a no-op on
    already-wide inputs): the per-vector fold block otherwise runs at the
    scan's row-group width — a single-file embedding sample computes every
    distance fold in one task.
    """
    from datagouvfr_data_pipelines_spark.session import fan_out

    base = semantic_base(fan_out(df, id_col), id_col, vec_col, centroids)
    return base.select(
        F.col(id_col).alias("doc"),
        "cell",
        F.col("__v").alias("vec"),
        F.col("__n").alias("nrm"),
        "c_sim",
    )


class IncrementalSemanticResult(NamedTuple):
    survivors: DataFrame  # batch rows that passed both tiers (id_col cols)
    index_rows: DataFrame  # build_semantic_index rows for the survivors
    ledger: DataFrame  # (doc, reason) for dropped docs
    cached: DataFrame | None = None  # the persisted batch index, if any

    def unpersist(self) -> None:
        """Release the persisted batch index. Call after materializing the
        result frames you need — the cache otherwise outlives the call and
        accumulates across a session (streaming/semantic_stream.py calls
        this per batch; one-shot callers can skip ``persist`` instead)."""
        if self.cached is not None:
            self.cached.unpersist()


def incremental_semantic_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.5,
    max_cell_size: int = 10_000,
    n_slices: int | None = None,
    persist: bool = True,
) -> IncrementalSemanticResult:
    """Dedup ``batch`` against ``index`` (see module docstring).

    ``index`` must have the ``build_semantic_index`` schema and the SAME
    (centroids, threshold-rounding) — indexes from different centroid sets
    are incomparable. Returns per-doc decisions; the caller appends
    ``index_rows`` to the index (atomically — see
    streaming/semantic_stream.py).

    ``persist=True`` caches the batch index (reused by both tiers and the
    survivor anti-join); callers must then ``result.unpersist()`` after
    materializing, or the cache leaks across the session. One-shot callers
    that consume a single result frame can pass ``persist=False`` and skip
    the bookkeeping (the assignment projection is recomputed, which is
    cheap relative to the pair stages).
    """
    bidx = build_semantic_index(batch, id_col, vec_col, centroids)
    if persist:
        bidx = bidx.persist()

    # -- corpus tier ---------------------------------------------------
    # prune the (large) corpus index to the batch's cells before anything
    # else (the batch is bounded, its cell set more so), then one
    # Arrow-batched per-cell kernel over the tagged corpus-union-batch
    # rows — the round-12 _cell_pair_candidates shape: O(rows·dim)
    # vectors shipped once, vectorized SEQUENTIAL-order dots (bit-exact
    # vs the JVM fold, see similarity._seq_dots_block), one row back per
    # batch doc with any prefiltered corpus hit. round(x, 6) is monotone,
    # so the per-doc MAX raw cosine decides the exact rounded any-hit
    # JVM-side; oversized corpus cells (> max_cell_size) return nothing
    # (batch members kept — the cap guardrail). The old salt-sliced
    # interpreted-fold join needed ``n_slices``; the parameter is now
    # accepted for API compatibility and ignored (results were always
    # slice-invariant).
    del n_slices
    bcells = F.broadcast(bidx.select("cell").distinct())
    corpus = index.join(bcells, "cell")
    tagged = corpus.select(
        "cell", "doc", "vec", "nrm", F.lit("c").alias("__side")
    ).unionByName(
        bidx.select("cell", "doc", "vec", "nrm", F.lit("b").alias("__side"))
    )
    id_t = bidx.schema["doc"].dataType.simpleString()
    pre = float(threshold) - 1e-6

    def corpus_kernel(pdf):
        import numpy as np
        import pandas as pd

        from datagouvfr_data_pipelines_spark.functions.similarity import (
            _PAIR_BLOCK_BYTES,
            _seq_dots_block,
        )

        pdf = pdf[pdf["vec"].notna()]
        c = pdf[pdf["__side"] == "c"]
        b = pdf[pdf["__side"] == "b"]
        empty = pd.DataFrame(
            {
                "doc": pd.Series([], dtype=pdf["doc"].dtype),
                "__raw": pd.Series([], dtype="float64"),
            }
        )
        if not len(b) or not len(c) or len(c) > max_cell_size:
            return empty
        CV = np.stack([np.asarray(v) for v in c["vec"]]).astype(np.float64)
        BV = np.stack([np.asarray(v) for v in b["vec"]]).astype(np.float64)
        cn = c["nrm"].to_numpy()
        bn = b["nrm"].to_numpy()
        docs = b["doc"].to_numpy()
        bs = max(64, _PAIR_BLOCK_BYTES // (16 * len(c)))
        out_docs, out_raw = [], []
        for i0 in range(0, len(b), bs):
            i1 = min(i0 + bs, len(b))
            S = _seq_dots_block(BV[i0:i1], CV)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(
                    (bn[i0:i1, None] == 0.0) | (cn[None, :] == 0.0),
                    0.0,
                    S / (bn[i0:i1, None] * cn[None, :]),
                )
            hit = sims >= pre
            rows = hit.any(axis=1)
            if not rows.any():
                continue
            mx = np.where(hit[rows], sims[rows], -np.inf).max(axis=1)
            out_docs.append(docs[i0:i1][rows])
            out_raw.append(mx)
        if not out_docs:
            return empty
        return pd.DataFrame(
            {"doc": np.concatenate(out_docs), "__raw": np.concatenate(out_raw)}
        )

    near_corpus = (
        tagged.groupBy("cell")
        .applyInPandas(corpus_kernel, schema=f"doc {id_t}, __raw double")
        .where(F.round("__raw", 6) >= threshold)
        .select("doc")
        .distinct()
    )

    # -- batch tier ------------------------------------------------------
    # reuse the (persisted) batch index as semantic_dedup's base so the
    # per-vector fold block is not re-derived from raw vectors a second
    # time — bidx and semantic_base carry the same values by construction
    near_batch = (
        semantic_dedup(
            batch,
            id_col,
            vec_col,
            centroids,
            threshold=threshold,
            max_cell_size=max_cell_size,
            base=bidx.select(
                F.col("doc").alias(id_col),
                F.col("vec").alias("__v"),
                "cell",
                F.col("nrm").alias("__n"),
                "c_sim",
            ),
        )
        .where(F.col("status") == "dropped")
        .select(F.col(id_col).alias("doc"))
    )

    # -- combine: near_corpus > near_batch -------------------------------
    # one union + precedence groupBy (the _combine shape of
    # incremental_dedup): the old anti-join form referenced near_corpus
    # from TWO branches, and with no cross-branch subtree sharing the
    # whole corpus-tier pair join executed twice per action
    nc = near_corpus.withColumn("reason", F.lit("near_corpus"))
    nb = near_batch.withColumn("reason", F.lit("near_batch"))
    pri = F.array_position(
        F.array(F.lit("near_corpus"), F.lit("near_batch")), F.col("reason")
    )
    ledger = (
        nc.unionByName(nb)
        .groupBy("doc")
        .agg(F.min_by("reason", pri).alias("reason"))
    )
    dropped = ledger.select(F.col("doc").alias("__dropped_id"))
    survivors = batch.join(
        dropped, F.col(id_col) == F.col("__dropped_id"), "left_anti"
    )
    index_rows = bidx.join(dropped, bidx.doc == F.col("__dropped_id"), "left_anti")
    return IncrementalSemanticResult(
        survivors, index_rows, ledger, bidx if persist else None
    )


def build_semantic_index_scaled(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """Large-k index build: same (doc, cell, vec, nrm, c_sim) schema as
    ``build_semantic_index`` but assignment is the ONE-GEMM-per-batch
    ``semantic_assign_scaled`` path (the literal-expression assigner grows
    exponentially in k and stops at k ~ 16; at SemDeDup scale k runs into
    the thousands). ``vec`` is float64 (the GEMM working type — exact for
    float32 inputs), so scaled and expression-path indexes have different
    vector types and last-ulp-different norms: like portable-vs-xxhash
    MinHash indexes, the two paths are INCOMPARABLE — pick one per index
    lifetime."""
    return semantic_assign_scaled(df, id_col, vec_col, centroids).select(
        F.col(id_col).alias("doc"),
        "cell",
        F.col("__v").alias("vec"),
        "nrm",
        "c_sim",
    )


def incremental_semantic_dedup_scaled(
    batch: DataFrame,
    index: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.5,
    max_cell_size: int = 10_000,
    persist: bool = True,
) -> IncrementalSemanticResult:
    """Large-k / large-corpus twin of ``incremental_semantic_dedup`` —
    identical decisions (parity test-pinned), vectorized stages:

    - batch assignment: ``semantic_assign_scaled`` (one GEMM per batch);
    - corpus tier: corpus pruned by a broadcast of the batch's cells,
      then ONE applyInPandas kernel per cell over the tagged
      corpus-union-batch rows — a single normalized corpus x batch GEMM,
      O(|corpus_cell| x |batch_cell| x dim) BLAS flops, corpus cells over
      ``max_cell_size`` skipped with the batch members KEPT;
    - batch tier: ``semantic_dedup_scaled``.

    ``index`` must come from ``build_semantic_index_scaled`` (float64
    vectors); mixing with the expression-path index is incomparable."""
    import numpy as np
    import pandas as pd  # noqa: F401

    bidx = build_semantic_index_scaled(batch, id_col, vec_col, centroids)
    if persist:
        bidx = bidx.persist()

    bcells = F.broadcast(bidx.select("cell").distinct())
    corpus = index.join(bcells, "cell").select(
        "cell", "doc", "vec", "nrm", F.lit("c").alias("__side")
    )
    batch_rows = bidx.select(
        "cell", "doc", "vec", "nrm", F.lit("b").alias("__side")
    )
    tagged = corpus.unionByName(batch_rows)
    id_field = bidx.schema["doc"].dataType.simpleString()

    def corpus_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        c = pdf[pdf["__side"] == "c"]
        b = pdf[pdf["__side"] == "b"]
        empty = pd.DataFrame({"doc": pd.Series([], dtype=b["doc"].dtype)})
        if not len(b) or not len(c) or len(c) > max_cell_size:
            return empty
        CV = np.asarray([np.asarray(v, dtype=np.float64) for v in c["vec"]])
        BV = np.asarray([np.asarray(v, dtype=np.float64) for v in b["vec"]])
        cn = c["nrm"].to_numpy()
        bn = b["nrm"].to_numpy()
        csafe = np.where(cn == 0.0, 1.0, cn)
        bsafe = np.where(bn == 0.0, 1.0, bn)
        S = np.round((BV / bsafe[:, None]) @ (CV / csafe[:, None]).T, 6)
        S[bn == 0.0, :] = 0.0
        S[:, cn == 0.0] = 0.0
        hit = (S >= threshold).any(axis=1)
        return pd.DataFrame({"doc": b["doc"].to_numpy()[hit]})

    near_corpus = tagged.groupBy("cell").applyInPandas(
        corpus_kernel, schema=f"doc {id_field}"
    )

    near_batch = (
        semantic_dedup_scaled(
            batch,
            id_col,
            vec_col,
            centroids,
            threshold=threshold,
            max_cell_size=max_cell_size,
        )
        .where(F.col("status") == "dropped")
        .select(F.col(id_col).alias("doc"))
    )

    nc = near_corpus.withColumn("reason", F.lit("near_corpus"))
    nb = (
        near_batch.join(near_corpus, "doc", "left_anti")
        .withColumn("reason", F.lit("near_batch"))
    )
    ledger = nc.unionByName(nb)
    dropped = ledger.select(F.col("doc").alias("__dropped_id"))
    survivors = batch.join(
        dropped, F.col(id_col) == F.col("__dropped_id"), "left_anti"
    )
    index_rows = bidx.join(dropped, bidx.doc == F.col("__dropped_id"), "left_anti")
    return IncrementalSemanticResult(
        survivors, index_rows, ledger, bidx if persist else None
    )
