"""Vector-similarity column functions (embedding ANN surface).

Dot products / norms are built from ``zip_with`` + ``aggregate`` — JVM-side
sequential folds, deterministic and identical to a left-to-right C loop, so
results hash-match a DuckDB ``list_reduce`` oracle. Per-vector projections
stay pure JVM expressions; the O(pairs) SemDeDup stages batch whole cells
to a vectorized numpy kernel (``_seq_dots_block``) that reproduces the SAME
left-to-right IEEE op order bit-for-bit — rounding and threshold filters
stay JVM-side, so oracle hashes are unchanged.

Scale notes: brute-force top-k against a single probe vector is a map +
TakeOrdered — embarrassingly parallel, no shuffle. All-pairs search must NOT
be brute force at 100 TB: use the LSH-bucketed variant in operators/dedup.py
(same band-join pattern as MinHash) or IVF (cluster-assign then search within
cells).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right fold dot product in double."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


# NOTE (measured, don't "optimize" this again): unrolling dot() into a
# fixed-dim chain of GetArrayItem products ((0.0 + a[0]*b[0]) + ...) to get
# whole-stage codegen is 3x SLOWER than the interpreted fold at dim=64
# (9.1 s vs 3.1 s over 249k pairs, local[32]) — the 64-term chain compiles
# into a method large enough that HotSpot's huge-method limit refuses to
# JIT it, so it runs as interpreted BYTECODE, worse than Catalyst's
# specialized fold loop. The productive lever on O(pairs) stages is
# PARALLELISM (see semantic_dedup's slice salting), not the dot form.


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double; 0.0 on zero-norm vectors."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(d / (na * nb))


def kmeans_fit(
    df: "DataFrame",
    vec_col: str,
    k: int = 16,
    iterations: int = 3,
    seed_mod: int = 9973,
    portable: bool = False,
    init_id_col: str | None = None,
) -> list[list[float]]:
    """Lloyd's k-means on an embedding column with pure DataFrame ops — the
    IVF coarse quantizer trainer.

    Init: deterministic sample (vec hash mod ``seed_mod``) of k rows.
    Iterate: assign each vector to its nearest centroid (broadcast literal
    centroid arrays, JVM-side distance folds), recompute centroids via
    posexplode + groupBy(cell, dim) mean — two shuffles per iteration,
    no data leaves the cluster. Returns the centroid list (small, driver).
    Train on a SAMPLE at 100 TB scale; assignment stays full-data.

    ``portable=True`` (requires ``init_id_col``) makes EVERY step
    reproducible in a DuckDB oracle: seeds ordered by the ANSI LCG id hash
    (sketches.portable_id_hash) instead of xxhash64, and centroid updates
    accumulated as floor(x*1e9) integer nano-units (the README float
    policy — decimal casts OF FLOAT are not engine-portable) with the mean
    finished as the same (s / n) / 1e9 double expression both engines
    evaluate. Same plan shape and convergence behavior.
    """
    dim = len(df.select(vec_col).first()[0])
    if portable:
        if init_id_col is None:
            raise ValueError("portable k-means init needs init_id_col")
        from datagouvfr_data_pipelines_spark.operators.sketches import (
            portable_id_hash,
        )

        seeds = (
            df.select(vec_col, init_id_col)
            .orderBy(portable_id_hash(init_id_col), F.col(init_id_col))
            .limit(k)
            .collect()
        )
    else:
        seeds = (
            df.select(vec_col)
            .orderBy(
                F.pmod(
                    F.xxhash64(F.col(vec_col).cast("array<string>")),
                    F.lit(seed_mod),
                )
            )
            .limit(k)
            .collect()
        )
    centroids = [[float(x) for x in r[0]] for r in seeds]
    for _i in range(iterations):
        assigned = df.select(
            F.col(vec_col).alias("v"),
            nearest_centroid(vec_col, centroids).alias("cell"),
        )
        # exact integer/decimal sums: centroid updates must be bit-identical
        # across runs and shuffle orders, else boundary points flip cells
        if portable:
            s_expr = F.sum(
                F.floor(F.col("x").cast("double") * F.lit(1e9)).cast("long")
            ).alias("s")
        else:
            s_expr = (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double").alias("s")
            )
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(s_expr, F.count(F.lit(1)).alias("n"))
        )
        rows = sums.collect()
        new = [list(c) for c in centroids]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in rows:
            acc.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["s"]
            cnt[r["cell"]] = r["n"]
        for cell, vec in acc.items():
            if portable:
                new[cell] = [(x / cnt[cell]) / 1e9 for x in vec]
            else:
                new[cell] = [x / cnt[cell] for x in vec]
        centroids = new
    return centroids


def nearest_centroid(vec: Column | str, centroids: list[list[float]]) -> Column:
    """Cell id = argmin squared L2 distance to the (literal) centroids,
    ties to the lower cell id.

    Centroids are embedded as array literals so the whole assignment is one
    JVM-side projection — no UDF, no join. The distances land in ONE array
    and the argmin is ``array_position(d, array_min(d))``, so the
    expression is LINEAR in k. (The previous chained when/least form
    referenced each partial-min tree twice per step — exponential
    expression growth that capped k around 16; round 7. ``array_min``
    returns an element of the array, so the equality lookup is exact, and
    ``array_position`` returns the FIRST match — the same lowest-cell-id
    tie-break as the strict ``<`` chain.) For k beyond a few hundred use
    the numpy path (``semantic_dedup_scaled``'s one-GEMM assignment)."""
    v = _col(vec)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_search(
    df: "DataFrame",
    vec_col: str,
    id_col: str,
    probe: list[float],
    centroids: list[list[float]],
    n_probe_cells: int = 2,
    top_k: int = 10,
) -> "DataFrame":
    """ANN search: score only vectors in the ``n_probe_cells`` cells nearest
    the probe — the IVF scale path (search cost / n_cells, recall tuned by
    n_probe_cells).

    Probe-cell ranking uses a sequential left-to-right distance fold
    (ties to the lower cell id) — the same association order as the
    JVM/SQL folds, so a DuckDB oracle reproduces the cell choice
    (numpy's pairwise-summed ``.sum`` rounds differently)."""
    d2 = [
        sum((float(ci) - float(pi)) ** 2 for ci, pi in zip(c, probe))
        for c in centroids
    ]
    probe_cells = [
        cell for _, cell in sorted((d, i) for i, d in enumerate(d2))
    ][:n_probe_cells]
    parr = F.array(*[F.lit(float(x)) for x in probe])
    candidates = df.where(
        nearest_centroid(vec_col, centroids).isin(probe_cells)
    )
    return (
        candidates.select(
            F.col(id_col),
            F.round(cosine(vec_col, parr), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def ivf_cell(a: Column | str, n_cells: int = 64) -> Column:
    """Cheap IVF-style cell assignment: sign-bits of the first log2(n) dims.

    A deterministic stand-in for k-means centroids that needs no training
    pass: bucket by the sign pattern of leading components. Used to restrict
    ANN search to one cell (plus neighbors) instead of the full corpus.
    """
    import math

    bits = int(math.log2(n_cells))
    v = _col(a)
    cell = F.lit(0)
    for i in range(bits):
        cell = cell * 2 + F.when(F.element_at(v, i + 1) >= 0, 1).otherwise(0)
    return cell.cast("int")


def knn_join(
    corpus: "DataFrame",
    vec_col: str,
    id_col: str,
    probes: "DataFrame",
    probe_id_col: str,
    probe_vec_col: str,
    k: int = 10,
    fan_buckets: int = 8,
) -> "DataFrame":
    """Exact k-NN join: for every probe vector, the ``k`` most-cosine-similar
    corpus vectors, with a deterministic (sim DESC, id ASC) total order and a
    1-based ``rank``.

    Scale shape: probes broadcast to every corpus partition (Q is small by
    assumption — it is the query batch, not the corpus); scoring is a
    shuffle-free map. The naive per-probe top-k would then shuffle ALL Q x N
    scored rows onto Q reducers — a guaranteed skew wall at 100 TB. Instead
    a salt on the corpus id splits each probe's candidates across
    ``fan_buckets`` reducers for a partial top-k, and only the Q x
    fan_buckets x k survivors reach the final exact top-k. Both stages use
    the same total order, so the result equals the single-window form
    (oracle-checked) for any bucket count.
    """
    from pyspark.sql import DataFrame, Window  # noqa: F401

    scored = corpus.crossJoin(F.broadcast(probes)).select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine(vec_col, probe_vec_col).alias("__sim"),
        F.pmod(F.col(id_col), F.lit(fan_buckets)).alias("__salt"),
    )
    w_partial = Window.partitionBy(probe_id_col, "__salt").orderBy(
        F.col("__sim").desc(), F.col(id_col).asc()
    )
    survivors = (
        scored.withColumn("__rn", F.row_number().over(w_partial))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w_final = Window.partitionBy(probe_id_col).orderBy(
        F.col("__sim").desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .select(
            probe_id_col,
            id_col,
            F.round("__sim", 6).alias("sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pca_fit(
    df: "DataFrame",
    vec_col: str,
    k: int = 8,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit a PCA basis over an embedding column — the dimensionality-
    reduction stage in front of ANN (project 1024-dim embeddings down to
    k before IVF/LSH and the distance folds get k/d times cheaper).

    Distributed shape: one ``mapInPandas`` pass emits a PARTIAL moment set
    per Arrow batch — count, per-dim sum, and the d x d gram matrix
    (numpy outer-product accumulation, the only sane way to build a gram
    matrix; exploding d^2 terms per row through a shuffle is quadratic
    fan-out for no benefit). Partials are d x d + d + 1 doubles per batch
    — thousands of rows TOTAL at any corpus size — so the driver reduce +
    eigendecomposition is trivially small. Train on a sample at the 100 TB
    tier; projection stays full-data (``pca_transform``).

    Returns (components [k][d] — orthonormal rows, sorted by descending
    eigenvalue with a deterministic sign convention; mean [d];
    explained_variance [k]). Float reduce order varies with partitioning,
    so components are stable to ~1e-6, not bit-identical — fine for a
    basis, which is why PCA queries are test-checked, not hash-oracled.
    """
    import numpy as np
    import pandas as pd

    def partials(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).reshape(-1).tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    # deterministic sign: largest-|coefficient| entry of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return (
        comps.tolist(),
        mean.tolist(),
        eigvals[order].clip(min=0.0).tolist(),
    )


def pca_transform(
    df: "DataFrame",
    vec_col: str,
    components: list[list[float]],
    mean: list[float],
    out_col: str = "pca",
) -> "DataFrame":
    """Project vectors onto a fitted PCA basis with pure column expressions:
    center once (``zip_with`` against the broadcast mean literal), then one
    JVM-side fold per component. No Python in the projection path — the
    full-corpus pass stays codegen'd; only the k x d basis rides along as
    literals."""
    mu = F.array(*[F.lit(float(v)) for v in mean])
    centered = F.zip_with(_col(vec_col), mu, lambda a, b: a.cast("double") - b)
    outs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(v)) for v in w]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for w in components
    ]
    return df.withColumn(out_col, F.array(*outs))


def pq_fit(
    df: "DataFrame",
    vec_col: str,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    portable: bool = False,
    init_id_col: str | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m`` subspaces
    and k-means each independently (Jegou et al., "Product Quantization for
    Nearest Neighbor Search" — public method). Returns m codebooks of k
    sub-centroids each.

    At 100 TB this is the vector-compression tier: d floats -> m bytes
    (k<=256) shrinks an embedding corpus ~4*d/m x, enough to keep the whole
    index in executor memory for ADC scans. Train on a sample; encoding
    stays full-data (``pq_encode``).
    """
    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    id_cols = [F.col(init_id_col)] if portable and init_id_col else []
    return [
        kmeans_fit(
            df.select(
                F.slice(_col(vec_col), j * sub + 1, sub).alias("__sub"), *id_cols
            ),
            "__sub",
            k=k,
            iterations=iterations,
            portable=portable,
            init_id_col=init_id_col,
        )
        for j in range(m)
    ]


def pq_encode(
    df: "DataFrame",
    vec_col: str,
    codebooks: list[list[list[float]]],
    code_col: str = "pq_code",
) -> "DataFrame":
    """Encode vectors to ``m`` sub-centroid ids (array<int>). Pure JVM
    column expressions (literal codebooks + distance folds) — no UDF, no
    shuffle; the encode pass is a map over the corpus."""
    sub = len(codebooks[0][0])
    codes = [
        nearest_centroid(F.slice(_col(vec_col), j * sub + 1, sub), cb)
        for j, cb in enumerate(codebooks)
    ]
    return df.withColumn(code_col, F.array(*codes))


def pq_search(
    encoded: "DataFrame",
    id_col: str,
    probe: list[float],
    codebooks: list[list[list[float]]],
    top_k: int = 10,
    code_col: str = "pq_code",
) -> "DataFrame":
    """ADC (asymmetric distance) top-k: precompute the probe->sub-centroid
    distance table per subspace on the driver (m x k doubles), then the
    distance of every encoded vector is m table lookups — a shuffle-free
    map + TakeOrdered, never touching the original floats.
    """
    sub = len(codebooks[0][0])
    dist = F.lit(0.0)
    for j, cb in enumerate(codebooks):
        pj = probe[j * sub : (j + 1) * sub]
        table = [
            sum((pj[t] - c[t]) ** 2 for t in range(sub)) for c in cb
        ]
        tarr = F.array(*[F.lit(float(x)) for x in table])
        dist = dist + F.element_at(
            tarr, F.element_at(F.col(code_col), j + 1) + 1
        )
    return (
        encoded.select(F.col(id_col), F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(top_k)
    )


def pq_search_rerank(
    df: "DataFrame",
    vec_col: str,
    id_col: str,
    probe: list[float],
    codebooks: list[list[list[float]]],
    top_k: int = 10,
    shortlist: int = 50,
    code_col: str = "pq_code",
) -> "DataFrame":
    """Two-stage PQ ANN: ADC shortlist (compressed scan, ``shortlist``
    candidates) -> exact L2 re-rank of the shortlist against the original
    vectors. This is the production PQ shape — the compressed pass prunes
    the corpus, the exact pass restores recall; only ``shortlist`` original
    vectors are ever touched, via a broadcast semi-join (no shuffle of the
    corpus)."""
    enc = df if code_col in df.columns else pq_encode(df, vec_col, codebooks, code_col)
    short = pq_search(
        enc, id_col, probe, codebooks, top_k=shortlist, code_col=code_col
    ).select(id_col)
    parr = F.array(*[F.lit(float(x)) for x in probe])
    exact_d = F.aggregate(
        F.zip_with(
            _col(vec_col),
            parr,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.join(F.broadcast(short), on=id_col)
        .select(F.col(id_col), F.round(exact_d, 6).alias("l2_dist"))
        .orderBy(F.col("l2_dist").asc(), F.col(id_col).asc())
        .limit(top_k)
    )


def semantic_base(
    df: "DataFrame",
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> "DataFrame":
    """Shared SemDeDup per-vector projection: (id, __v, cell, __n, c_sim)
    — nearest-centroid cell, L2 norm, and the rounded cosine to the OWN
    centroid, all computed once per VECTOR before any self- or
    corpus-join (per-pair norm folds are the dominant cost of the naive
    form). Used by ``semantic_dedup`` and the incremental ingest tier
    (operators/incremental_semantic.py), which must agree bit-for-bit on
    these columns.

    (measured, don't redo: fanning df BEFORE these projections costs
    more in the extra exchange of raw vectors than parallelizing the
    per-vector folds saves — 1.9 -> 2.3 s at sf0.1; the slice-salting
    repartitions of the consumers already fan the expensive pair stage)
    """
    cell = nearest_centroid(vec_col, centroids)
    base = df.select(
        F.col(id_col),
        _col(vec_col).alias("__v"),
        cell.alias("cell"),
        norm(vec_col).alias("__n"),
    )
    # own-centroid cosine WITHOUT re-folding norms per row: the vector
    # norm is the already-computed ``__n`` column (CollapseProject keeps
    # the producer separate — the fold is non-cheap and referenced per
    # arm), and each centroid's norm is folded ONCE here in Python with
    # the exact operation sequence of ``norm`` (left-to-right acc + x*x
    # in IEEE doubles, then sqrt) so the value is bit-identical to the
    # per-row fold it replaces. Measured 2.21 -> 1.80 s on the sf0.1
    # 2000-vector projection; row-identical output.
    c_sim = F.lit(0.0)
    na = F.col("__n")
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        acc = 0.0
        for x in c:
            fx = float(x)
            acc = acc + fx * fx
        nb = math.sqrt(acc)
        arm = F.when((na == 0.0) | (F.lit(nb) == 0.0), F.lit(0.0)).otherwise(
            dot("__v", carr) / (na * F.lit(nb))
        )
        c_sim = F.when(F.col("cell") == i, F.round(arm, 6)).otherwise(c_sim)
    return base.withColumn("c_sim", c_sim)


_PAIR_BLOCK_BYTES = 32 << 20  # peak per-task scratch for the pair kernels


def _seq_dots_block(A, B):
    """All-pairs dot products with SEQUENTIAL-over-dims accumulation:
    ``S[i, j] = ((0 + A[i,0]*B[j,0]) + A[i,1]*B[j,1]) + ...`` — the exact
    IEEE operation order of the JVM left-to-right ``dot`` fold, vectorized
    over pairs (one elementwise outer product per dimension, accumulated
    in place; in-place add is the same IEEE add, no reassociation). Bit-
    identical to evaluating ``dot`` per pair, at BLAS-class throughput."""
    import numpy as np

    S = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
    tmp = np.empty_like(S)
    for t in range(A.shape[1]):
        np.multiply(A[:, t][:, None], B[:, t][None, :], out=tmp)
        S += tmp
    return S


def _cell_pair_candidates(
    base: "DataFrame",
    id_col: str,
    threshold: float,
    max_cell_size: int,
) -> "DataFrame":
    """Within-cell candidate pairs for ``semantic_dedup``: one Arrow-batched
    ``applyInPandas`` kernel per cell (guide-§4 shape — ship O(n·dim)
    vectors once, compute pair sims in vectorized native code) instead of
    the O(pairs·dim) interpreted-fold self-join.

    Bit-exactness contract: raw cosines use ``_seq_dots_block`` (the exact
    JVM fold order) over the float64-cast vectors and the base's ``__n``
    norms, so every returned ``__raw`` equals the expression form's
    pre-round value bitwise. The kernel prefilters at ``threshold - 1e-6``
    — ``round(x, 6)`` moves x by <= 5e-7, so no pair the exact JVM filter
    (``round(__raw, 6) >= threshold``, applied by the caller) would keep is
    lost, and the few boundary extras are re-filtered exactly JVM-side.
    Output is O(matching pairs), the same stream the old join produced
    post-filter. Cells over ``max_cell_size`` return no pairs (members all
    kept — the cap guardrail); memory per task is blocked to
    ``_PAIR_BLOCK_BYTES`` scratch regardless of cell size."""
    id_t = base.schema[id_col].dataType.simpleString()
    out_schema = (
        f"__ida {id_t}, __idb {id_t}, __ca double, __cb double, __raw double"
    )
    pre = float(threshold) - 1e-6

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf[pdf["__v"].notna()]
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "__ida": pd.Series([], dtype=pdf[id_col].dtype),
                "__idb": pd.Series([], dtype=pdf[id_col].dtype),
                "__ca": pd.Series([], dtype="float64"),
                "__cb": pd.Series([], dtype="float64"),
                "__raw": pd.Series([], dtype="float64"),
            }
        )
        if n < 2 or n > max_cell_size:
            return empty
        V = np.stack([np.asarray(v) for v in pdf["__v"]]).astype(np.float64)
        nrm = pdf["__n"].to_numpy()
        ids = pdf[id_col].to_numpy()
        ca = pdf["c_sim"].to_numpy()
        bs = max(64, _PAIR_BLOCK_BYTES // (16 * n))
        outs = []
        for i0 in range(0, n, bs):
            i1 = min(i0 + bs, n)
            S = _seq_dots_block(V[i0:i1], V)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(
                    (nrm[i0:i1, None] == 0.0) | (nrm[None, :] == 0.0),
                    0.0,
                    S / (nrm[i0:i1, None] * nrm[None, :]),
                )
            gi, gj = np.nonzero(sims >= pre)
            keep = (gi + i0) < gj  # each unordered row pair once
            gi, gj = gi[keep], gj[keep]
            if not len(gi):
                continue
            raw = sims[gi, gj]
            ai, bi = gi + i0, gj
            swap = ids[ai] > ids[bi]
            a_idx = np.where(swap, bi, ai)
            b_idx = np.where(swap, ai, bi)
            outs.append(
                pd.DataFrame(
                    {
                        "__ida": ids[a_idx],
                        "__idb": ids[b_idx],
                        "__ca": ca[a_idx],
                        "__cb": ca[b_idx],
                        "__raw": raw,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        base.select(id_col, "__v", "cell", "__n", "c_sim")
        .groupBy("cell")
        .applyInPandas(cell_pairs, schema=out_schema)
    )


def _cell_cosine_pairs(
    emb: "DataFrame",
    id_col: str,
    vec_col: str,
    cell_col: str,
    nrm_col: str,
    threshold: float,
) -> "DataFrame":
    """Within-cell cosine candidate pairs (round 13): the
    ``_cell_pair_candidates`` kernel shape for the IVF near-dup queries —
    one Arrow-batched ``applyInPandas`` kernel per cell instead of the
    O(pairs·dim) interpreted-fold self-join, no cell cap (the IVF queries
    pair EVERY cell; per-task scratch stays blocked to
    ``_PAIR_BLOCK_BYTES``).

    Same bit-exactness contract: ``__raw`` uses ``_seq_dots_block`` (the
    JVM left-to-right ``dot`` fold order) over float64-cast vectors and
    the JVM-computed ``nrm_col`` norms, divided by the norm product
    (float multiply is commutative bitwise, so pair orientation is
    irrelevant); zero-norm pairs become 0.0 exactly like the ``cosine``
    zero guard. The kernel prefilters at ``threshold - 1e-6``; callers
    re-apply the EXACT ``round(__raw, 6) >= threshold`` filter JVM-side.
    Returns (id_a, id_b, __raw) with id_a < id_b."""
    id_t = emb.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, __raw double"
    pre = float(threshold) - 1e-6

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=pdf[id_col].dtype),
                "id_b": pd.Series([], dtype=pdf[id_col].dtype),
                "__raw": pd.Series([], dtype="float64"),
            }
        )
        if n < 2:
            return empty
        V = np.stack([np.asarray(v) for v in pdf[vec_col]]).astype(np.float64)
        nrm = pdf[nrm_col].to_numpy()
        ids = pdf[id_col].to_numpy()
        bs = max(64, _PAIR_BLOCK_BYTES // (16 * n))
        outs = []
        for i0 in range(0, n, bs):
            i1 = min(i0 + bs, n)
            S = _seq_dots_block(V[i0:i1], V)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where(
                    (nrm[i0:i1, None] == 0.0) | (nrm[None, :] == 0.0),
                    0.0,
                    S / (nrm[i0:i1, None] * nrm[None, :]),
                )
            gi, gj = np.nonzero(sims >= pre)
            keep = (gi + i0) < gj  # each unordered row pair once
            gi, gj = gi[keep], gj[keep]
            if not len(gi):
                continue
            raw = sims[gi, gj]
            ai, bi = gi + i0, gj
            swap = ids[ai] > ids[bi]
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[np.where(swap, bi, ai)],
                        "id_b": ids[np.where(swap, ai, bi)],
                        "__raw": raw,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        emb.select(id_col, vec_col, cell_col, nrm_col)
        .groupBy(cell_col)
        .applyInPandas(cell_pairs, schema=out_schema)
    )


def semantic_dedup(
    df: "DataFrame",
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.5,
    max_cell_size: int = 10_000,
    n_slices: int | None = None,
    base: "DataFrame | None" = None,
    persist_base: bool = False,
):
    """SemDeDup semantic deduplication (Abbas et al. 2023, public method):
    assign every vector to its nearest k-means centroid, and inside each
    cluster drop one member of every pair with cosine >= ``threshold`` —
    keeping the member FARTHEST from the centroid (lowest centroid-cosine;
    ties keep the smaller id), the diversity-preserving rule of the paper.
    The greedy pairwise form is deterministic and closed under chains: in a
    similar-chain a~b~c every pair contributes its independent drop vote.

    Returns one row per input vector: (id, cell, c_sim, status) with
    ``c_sim`` the rounded cosine to its own centroid and ``status``
    kept|dropped.

    Scale shape: pair expansion happens ONLY within a cluster (one shuffle
    on the cell key) — O(sum cell_size^2), never all-pairs. Cluster count k
    must grow with corpus size (k ~ n / target_cell_size, the SemDeDup
    recipe) so cells stay bounded; train ``kmeans_fit`` on a sample, assign
    full-data. ``max_cell_size`` is the hard guardrail behind that
    convention (the ``max_bucket_size`` of dedup.py:minhash_lsh_candidates):
    cells larger than the cap SKIP pair expansion entirely — their members
    all stay ``kept`` (keeping a duplicate is safe; dropping on partial
    pair evidence is not) — so one skewed embedding cluster at 100 TB
    bounds to O(n) instead of an unbounded O(cell^2) blow-up. Norms and
    centroid cosines are computed per VECTOR before pair expansion (the
    emb_neardup_pairs lesson: higher-order folds are interpreted, so
    per-pair norm folds dominate the naive form).

    Round 12: the pair stage is ``_cell_pair_candidates`` — one
    Arrow-batched per-cell kernel (O(n·dim) vectors shipped once,
    vectorized sequential-order dots, O(matching pairs) back) instead of
    the interpreted O(pairs·dim) fold self-join; bit-identical by the
    kernel's exactness contract (rounding and the threshold filter stay
    JVM-side), measured 1.31 -> 0.68 s on the sf0.1 catalog query. The
    old form's ``n_slices`` salt is therefore obsolete — the parameter is
    accepted for API compatibility and ignored (results were always
    slice-invariant; the kernel needs no AQE-coalescing guard because the
    per-cell compute is vectorized, not interpreted).

    The ``base`` projection feeds the kernel and the final status join;
    ``persist_base=True`` computes it once (the cached rows are the
    compact per-vector index, bounded like the MinHash ``sh`` cache of
    dedup.near_duplicate_pairs; long-lived sessions reclaim it via
    ``spark.catalog.clearCache()``), with the input fanned on ``id_col``
    first so the per-vector fold block is not serialized behind a narrow
    scan. Callers that already hold the projection (the incremental
    ingest tier persists its batch index) pass it via ``base`` — it must
    carry the ``semantic_base`` schema and the SAME centroids.
    """
    if base is None:
        if persist_base:
            from datagouvfr_data_pipelines_spark.session import fan_out

            base = semantic_base(
                fan_out(df, id_col), id_col, vec_col, centroids
            ).persist()
        else:
            base = semantic_base(df, id_col, vec_col, centroids)
    del n_slices  # obsolete (kernel path; kept for API compatibility)
    pairs = (
        _cell_pair_candidates(base, id_col, threshold, max_cell_size)
        .withColumn("__sim", F.round("__raw", 6))
        .where(F.col("__sim") >= threshold)
    )
    drop_id = (
        F.when(F.col("__ca") < F.col("__cb"), F.col("__idb"))
        .when(F.col("__cb") < F.col("__ca"), F.col("__ida"))
        .otherwise(F.greatest("__ida", "__idb"))
    )
    dropped = pairs.select(drop_id.alias(id_col)).distinct().withColumn(
        "__d", F.lit(1)
    )
    return base.join(dropped, id_col, "left").select(
        F.col(id_col),
        "cell",
        "c_sim",
        F.when(F.col("__d").isNotNull(), F.lit("dropped"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def kmeans_fit_np(
    df: "DataFrame",
    vec_col: str,
    k: int,
    iterations: int = 10,
    sample_rows: int = 65_536,
) -> list[list[float]]:
    """Sample-trained Lloyd's k-means for LARGE k — the 100 TB SemDeDup
    trainer companion to ``kmeans_fit``.

    ``kmeans_fit``/``nearest_centroid`` embed centroids as literal
    expressions whose when/least tree grows exponentially in k (each step
    re-references the previous best-distance tree twice), so they stop at
    small k. At SemDeDup scale k ~ n / target_cell_size runs into the
    thousands; the standard recipe (Abbas et al. 2023) trains on a bounded
    SAMPLE and assigns full-data. This trainer takes a deterministic
    hash-ordered sample of ``sample_rows`` vectors (TakeOrdered — a top-N
    heap, no full sort), runs vectorized Lloyd's on the driver (the sample
    is bounded and tiny next to the corpus — same driver-side footprint
    class as the sketch folds), and returns the k x dim centroid list for
    ``semantic_dedup_scaled`` to assign distributively. Empty cells keep
    their previous centroid. Deterministic for fixed input."""
    import numpy as np

    sample = (
        df.select(_col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<string>")))
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([r["v"] for r in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"sample ({len(X)}) smaller than k ({k})")
    C = X[:k].copy()
    for _ in range(iterations):
        # argmin ||x - c||^2 = argmin (|c|^2 - 2 x.c) via one GEMM
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        cells = d2.argmin(axis=1)
        for j in range(k):
            members = X[cells == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def semantic_assign_scaled(
    df: "DataFrame",
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> "DataFrame":
    """Large-k twin of ``semantic_base``: (id, cell, c_sim, nrm, __v) via
    ONE mapInPandas GEMM per Arrow batch against the broadcast k x dim
    centroid matrix — O(k·dim) per row and flat in plan size, where the
    literal-expression path grows exponentially in k. ``__v`` comes back
    float64 (the GEMM working type; exact for float32 inputs). Shared by
    ``semantic_dedup_scaled`` and the scaled incremental ingest tier.
    Float caveat vs the expression path: numpy sums pairwise while the
    JVM fold is sequential — last-ulp differences can flip a rounded
    value sitting exactly on a 5e-7 boundary (parity is test-pinned on
    the real embeddings)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    id_field = df.schema[id_col].dataType.simpleString()
    mid_schema = (
        f"{id_col} {id_field}, cell int, c_sim double, nrm double, "
        f"__v array<double>"
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            G = V @ C.T
            d2 = (cn * cn)[None, :] - 2.0 * G
            cells = d2.argmin(axis=1)
            vn = np.sqrt((V * V).sum(axis=1))
            denom = vn * cn[cells]
            cs = np.where(
                denom == 0.0,
                0.0,
                G[np.arange(len(V)), cells] / np.where(denom == 0.0, 1.0, denom),
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cells.astype("int32"),
                    "c_sim": np.round(cs, 6),
                    "nrm": vn,
                    "__v": list(V),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema=mid_schema)


def semantic_dedup_scaled(
    df: "DataFrame",
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.5,
    max_cell_size: int = 10_000,
):
    """SemDeDup for large k / large corpora: same semantics and output
    schema as ``semantic_dedup`` — (id, cell, c_sim, status), keep-farthest
    drop rule, ties keep the smaller id, oversized cells (> max_cell_size)
    skip pair expansion with all members kept — but every numeric stage is
    vectorized numpy over Arrow batches instead of literal expressions:

    - assignment + centroid cosine: one ``mapInPandas`` pass, a single
      GEMM per batch against the broadcast k x dim centroid matrix (the
      literal-expression path grows exponentially in k; this is O(k·dim)
      per row and flat in plan size);
    - within-cell pairwise cosine: ``applyInPandas`` per cell — one
      normalized GEMM per cell, O(cell^2·dim) BLAS flops, bounded by the
      cap. One shuffle total (the cell key), no driver-side data.

    Parity with the exact path is pinned by tests (statuses equal on the
    real embeddings table); c_sim rounding (6 dp) matches. Float caveat:
    numpy sums pairwise while the JVM fold is sequential — last-ulp
    differences can flip a rounded value sitting exactly on a 5e-7
    boundary, which the parity test would surface."""
    assigned = semantic_assign_scaled(df, id_col, vec_col, centroids).drop(
        "nrm"
    )
    import numpy as np
    import pandas as pd  # noqa: F401  (applyInPandas kernel annotation)

    id_field = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_field}, cell int, c_sim double, status string"

    def dedup_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        out = pdf[[id_col, "cell", "c_sim"]].copy()
        out["status"] = "kept"
        if n < 2 or n > max_cell_size:
            return out
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        out = pdf[[id_col, "cell", "c_sim"]].copy()
        out["status"] = "kept"
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        vn = np.sqrt((V * V).sum(axis=1))
        safe = np.where(vn == 0.0, 1.0, vn)
        S = np.round((V / safe[:, None]) @ (V / safe[:, None]).T, 6)
        S[vn == 0.0, :] = 0.0
        S[:, vn == 0.0] = 0.0
        ca = pdf["c_sim"].to_numpy()
        ia, ib = np.triu_indices(n, k=1)  # ia < ib in sorted-id order
        hit = S[ia, ib] >= threshold
        ia, ib = ia[hit], ib[hit]
        # keep-farthest: drop the member closer to the centroid (higher
        # c_sim); ties drop the greater id (= index b in sorted order)
        drop = np.where(ca[ia] < ca[ib], ib, np.where(ca[ib] < ca[ia], ia, ib))
        out.loc[np.unique(drop), "status"] = "dropped"
        return out

    return assigned.groupBy("cell").applyInPandas(dedup_cell, schema=out_schema)
