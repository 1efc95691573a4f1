"""Round-7 hardening: SemDeDup max_cell_size cap, the numpy-scaled
SemDeDup/trainer pair (the large-k 100 TB path), and exact-vs-scaled
parity on the real embeddings table."""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark.functions.similarity import (
    kmeans_fit,
    kmeans_fit_np,
    semantic_dedup,
    semantic_dedup_scaled,
)


def _hot_cell_df(spark):
    # cell 0 (around [1,0]): 4 near-identical members -> pairs would drop 3.
    # cell 1 (around [-1,0]): 2 near-identical members -> 1 dropped.
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.01]),
            (3, [0.98, 0.02]),
            (4, [0.97, 0.03]),
            (10, [-1.0, 0.0]),
            (11, [-0.99, 0.01]),
        ],
        "vec_id long, embedding array<float>",
    )


CENTS = [[1.0, 0.0], [-1.0, 0.0]]


@pytest.mark.parametrize("impl", [semantic_dedup, semantic_dedup_scaled])
def test_semantic_dedup_max_cell_cap(spark, impl):
    """Cells above max_cell_size skip pair expansion (all members kept);
    cells within the cap dedup normally — the one uncapped pair-former
    flagged in rounds 5/6, now guarded like minhash's max_bucket_size."""
    df = _hot_cell_df(spark)
    out = {
        r.vec_id: r.status
        for r in impl(
            df, "vec_id", "embedding", CENTS, threshold=0.9, max_cell_size=3
        ).collect()
    }
    # hot cell (4 members > cap 3): everyone kept despite cosine ~1
    assert all(out[i] == "kept" for i in (1, 2, 3, 4))
    # small cell (2 members <= cap): normal keep-farthest dedup
    assert out[10] == "dropped" and out[11] == "kept"


@pytest.mark.parametrize("impl", [semantic_dedup, semantic_dedup_scaled])
def test_semantic_dedup_default_cap_no_change(spark, impl):
    """With the default (generous) cap both cells dedup as before."""
    df = _hot_cell_df(spark)
    out = {
        r.vec_id: r.status
        for r in impl(df, "vec_id", "embedding", CENTS, threshold=0.9).collect()
    }
    assert sum(1 for s in out.values() if s == "dropped") == 4
    # keep-farthest: the farthest-from-centroid member of each cell survives
    assert out[4] == "kept" and out[11] == "kept"


def test_semantic_dedup_scaled_parity_real_embeddings(spark, sf_dir):
    """The numpy-scaled path must reproduce the exact (oracle-checked)
    path on the real embeddings table: same cells, same rounded centroid
    cosines, same statuses."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(
        emb, "embedding", k=8, iterations=2, portable=True, init_id_col="vec_id"
    )
    exact = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", cents, threshold=0.35
        ).collect()
    }
    scaled = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup_scaled(
            emb, "vec_id", "embedding", cents, threshold=0.35
        ).collect()
    }
    assert set(exact) == set(scaled)
    diffs = {k: (exact[k], scaled[k]) for k in exact if exact[k] != scaled[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:3]}"


def test_kmeans_fit_np_deterministic_and_shapes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = kmeans_fit_np(emb, "embedding", k=16, iterations=3)
    c2 = kmeans_fit_np(emb, "embedding", k=16, iterations=3)
    assert c1 == c2
    assert len(c1) == 16 and len(c1[0]) == 64


def test_kmeans_fit_np_sample_smaller_than_k_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="smaller than k"):
        kmeans_fit_np(df, "embedding", k=5)


# --- geocode n-2/n+2 interpolation (reference geocode.py:296-556) ---

from datagouvfr_data_pipelines_spark.functions.udfs import (  # noqa: E402
    ban_select,
    geocode_structured,
)


def _canned(responses):
    """service(q, citycode) backed by a dict of canned responses."""
    def service(q, citycode):
        return responses.get((q, citycode))
    return service


def test_ban_select_direct_housenumber_hit():
    svc = _canned({
        ("17 RUE DE LA PAIX", "75102"): {
            "lon": 2.331, "lat": 48.869, "score": 0.92,
            "type": "housenumber", "label": "17 Rue de la Paix 75002 Paris",
            "housenumber": "17",
        },
    })
    got = ban_select("17", "RUE", "DE LA PAIX", "75102", svc)
    assert got == (2.331, 48.869, 0.92, "housenumber",
                   "17 Rue de la Paix 75002 Paris")


def test_ban_select_interpolation_arithmetic():
    """Exact parity with the reference midpoint arithmetic
    (geocode.py:374-407): per-axis mean rounded to 6 dp, mean score,
    type 'interpolation', label = numvoie + avant label minus its own
    housenumber prefix."""
    svc = _canned({
        # direct lookup resolves to a STREET and numvoie > 2 -> interpolate
        ("17 RUE DE LA PAIX", "75102"): {
            "lon": 2.33, "lat": 48.87, "score": 0.6, "type": "street",
            "label": "Rue de la Paix 75002 Paris", "housenumber": "",
        },
        ("15 RUE DE LA PAIX", "75102"): {
            "lon": 2.3312341, "lat": 48.8691113, "score": 0.81,
            "type": "housenumber", "label": "15 Rue de la Paix 75002 Paris",
            "housenumber": "15",
        },
        ("19 RUE DE LA PAIX", "75102"): {
            "lon": 2.3316668, "lat": 48.8693339, "score": 0.71,
            "type": "housenumber", "label": "19 Rue de la Paix 75002 Paris",
            "housenumber": "19",
        },
    })
    lon, lat, score, typ, label = ban_select(
        "17", "RUE", "DE LA PAIX", "75102", svc
    )
    assert lon == round((2.3312341 + 2.3316668) / 2, 6) == 2.33145
    assert lat == round((48.8691113 + 48.8693339) / 2, 6) == 48.869223
    assert score == (0.81 + 0.71) / 2
    assert typ == "interpolation"
    assert label == "17 Rue de la Paix 75002 Paris"


def test_ban_select_interpolation_on_total_miss():
    """ban is None also triggers the neighbor probe (the reference's
    `ban is None or ...` precedence)."""
    svc = _canned({
        ("9 RUE X", "01001"): {"lon": 1.0, "lat": 46.0, "score": 0.9,
                               "type": "housenumber", "label": "9 Rue X",
                               "housenumber": "9"},
        ("13 RUE X", "01001"): {"lon": 3.0, "lat": 46.5, "score": 0.4,
                                "type": "housenumber", "label": "13 Rue X",
                                "housenumber": "13"},
    })
    lon, lat, score, typ, _ = ban_select("11", "RUE", "X", "01001", svc)
    assert (lon, lat) == (2.0, 46.25)
    assert typ == "interpolation" and score == pytest.approx(0.65)


def test_ban_select_interpolation_guards():
    """avant must beat 0.5 and apres must beat score_min, both must be
    housenumbers — otherwise fall through to the street result."""
    base = {
        ("17 RUE Y", "75102"): {"lon": 2.0, "lat": 48.0, "score": 0.6,
                                "type": "street", "label": "Rue Y",
                                "housenumber": ""},
        ("19 RUE Y", "75102"): {"lon": 2.2, "lat": 48.2, "score": 0.9,
                                "type": "housenumber", "label": "19 Rue Y",
                                "housenumber": "19"},
    }
    # avant score 0.5 is NOT > 0.5 -> no interpolation -> street fallback
    svc = _canned({**base, ("15 RUE Y", "75102"): {
        "lon": 2.1, "lat": 48.1, "score": 0.5, "type": "housenumber",
        "label": "15 Rue Y", "housenumber": "15"}})
    got = ban_select("17", "RUE", "Y", "75102", svc)
    assert got[3] == "street" and got[0] == 2.0
    # avant is a street itself -> no interpolation
    svc = _canned({**base, ("15 RUE Y", "75102"): {
        "lon": 2.1, "lat": 48.1, "score": 0.9, "type": "street",
        "label": "Rue Y", "housenumber": ""}})
    assert ban_select("17", "RUE", "Y", "75102", svc)[3] == "street"


def test_ban_select_miss_and_any_type_fallback():
    assert ban_select("17", "RUE", "Z", "99999", _canned({})) == (
        None, None, None, None, None
    )
    # municipality coercion + any-type fallback (no numvoie, no street)
    svc = _canned({("LYON", "69123"): {
        "lon": 4.84, "lat": 45.76, "score": 0.8, "type": "city",
        "label": "Lyon", "housenumber": ""}})
    got = ban_select("", "", "LYON", "69123", svc)
    assert got == (4.84, 45.76, 0.8, "municipality", "Lyon")


def test_geocode_structured_plumbing(spark):
    """mapInPandas leg: distinct-address batching, join-back, nulls on
    miss; the default deterministic fake exercises every branch."""
    rows = [
        ("17", "RUE", "DE LA PAIX", "75102"),
        ("17", "RUE", "DE LA PAIX", "75102"),  # duplicate: one service hit
        ("", "", "LYON", "69123"),
        (None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "numvoie string, typvoie string, libvoie string, depcom string"
    )
    out = geocode_structured(df).collect()
    assert len(out) == 4
    by_lib = {}
    for r in out:
        by_lib.setdefault(r.libvoie, []).append(r)
    a, b = by_lib["DE LA PAIX"]
    assert (a.lon, a.lat, a.geo_type) == (b.lon, b.lat, b.geo_type)
    # canned service through the SPARK path gives the same interpolation
    svc_responses = {
        ("17 RUE DE LA PAIX", "75102"): {
            "lon": 2.33, "lat": 48.87, "score": 0.6, "type": "street",
            "label": "Rue de la Paix", "housenumber": ""},
        ("15 RUE DE LA PAIX", "75102"): {
            "lon": 2.3312341, "lat": 48.8691113, "score": 0.81,
            "type": "housenumber", "label": "15 Rue de la Paix",
            "housenumber": "15"},
        ("19 RUE DE LA PAIX", "75102"): {
            "lon": 2.3316668, "lat": 48.8693339, "score": 0.71,
            "type": "housenumber", "label": "19 Rue de la Paix",
            "housenumber": "19"},
    }
    one = spark.createDataFrame(
        [rows[0]], "numvoie string, typvoie string, libvoie string, depcom string"
    )
    r = geocode_structured(one, service=_canned(svc_responses)).collect()[0]
    assert (r.lon, r.lat, r.geo_type) == (2.33145, 48.869223, "interpolation")
    assert r.geo_label == "17 Rue de la Paix"


def test_remove_cross_doc_spans_residual_reporting(spark):
    """report_residual counts tokens marked for cut but saved by canonical
    -range protection — the observability hook for the keep-one
    relaxation (round-6 advice). The round-5 counterexample has exactly
    that overlap structure."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        remove_cross_doc_spans,
    )

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a b"), (3, "a a")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_cross_doc_spans(
            df, "doc_id", "text", n=2, min_docs=2, report_residual=True
        ).collect()
    }
    # schema: the extra column only appears when asked for
    assert "n_residual_words" in out[1].asDict()
    base = remove_cross_doc_spans(df, "doc_id", "text", n=2, min_docs=2)
    assert "n_residual_words" not in base.columns
    # doc 1 is canonical for both its grams -> nothing marked, 0 residual
    assert out[1].n_residual_words == 0
    # docs 2/3 carry overlapping marked+protected ranges: residual = tokens
    # that were marked but survived protection = total - removed - unmarked
    for d in (2, 3):
        r = out[d]
        assert r.n_residual_words >= 0
    # corpus-wide invariant: every kept-clean text still contains each
    # shared bigram at least once (the keep-one guarantee the residual
    # tokens pay for)
    texts = [out[d].clean_text for d in (1, 2, 3)]
    assert any("a b" in t for t in texts) and any("a a" in t for t in texts)
    # totals are consistent: residual tokens are kept tokens
    for d in (1, 2, 3):
        n_toks = len(out[d].clean_text.split()) if out[d].clean_text else 0
        orig = {1: 2, 2: 3, 3: 2}[d]
        assert orig - out[d].n_removed_words == n_toks
        assert out[d].n_residual_words <= n_toks


def test_nearest_centroid_linear_in_k(spark, sf_dir):
    """The argmin rewrite must (a) agree with numpy argmin (ties to the
    first index) on real embeddings, and (b) stay buildable at k=64 —
    the chained when/least form it replaces grew a 2^k expression tree
    and could not even be constructed there."""
    import numpy as np

    from datagouvfr_data_pipelines_spark.functions.similarity import (
        nearest_centroid,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit_np(emb, "embedding", k=64, iterations=2)
    got = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id", nearest_centroid("embedding", cents).alias("cell")
        ).collect()
    }
    C = np.asarray(cents)
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        d = ((v[None, :] - C) ** 2).sum(axis=1)
        assert got[r.vec_id] == int(d.argmin()), r.vec_id


def test_nearest_centroid_tie_prefers_lower_cell(spark):
    from datagouvfr_data_pipelines_spark.functions.similarity import (
        nearest_centroid,
    )

    df = spark.createDataFrame([(1, [0.0, 0.0])], "id long, v array<float>")
    # two identical centroids: the tie must resolve to cell 0
    cell = df.select(
        nearest_centroid("v", [[1.0, 0.0], [1.0, 0.0], [2.0, 0.0]]).alias("c")
    ).collect()[0]["c"]
    assert cell == 0


def test_fan_out_guard(spark):
    """fan_out must repartition a narrow frame up to default parallelism
    and leave an already-wide frame untouched (the no-op guard that makes
    it safe in 100 TB paths)."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    par = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    out = fan_out(narrow)
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 100
    wide = spark.createDataFrame([(i,) for i in range(100)], "x long").repartition(par + 3)
    assert fan_out(wide) is wide  # identity, not just equal partitioning


def test_repetition_stats_fused_parity(spark):
    """The fused single-stream repetition_stats (unigrams and bigrams share
    one explode+count chain, tagged by the space a bigram always contains)
    must reproduce the naive two-chain semantics, including the edge cases
    the fuse could plausibly break: a single-token doc (no bigram rows ->
    top_bigram_frac 0.0), a fully repeated doc, and zero-token docs
    (excluded entirely)."""
    from datagouvfr_data_pipelines_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),        # top word a: 3/5; dup 5/5; top bigram 2/4
            (2, "hello"),            # single token: bigram frac 0.0
            (3, "x y z"),            # all unique: top 1/3, dup 0, bigram 1/2
            (4, "   "),              # zero tokens: excluded
            (5, "w w"),              # top 2/2, dup 2/2, bigram 'w w' 1/1
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].top_word_frac, out[1].dup_word_frac, out[1].top_bigram_frac) == (
        3 / 5, 1.0, 2 / 4,
    )
    assert (out[2].top_word_frac, out[2].dup_word_frac, out[2].top_bigram_frac) == (
        1.0, 0.0, 0.0,
    )
    assert (out[3].top_word_frac, out[3].dup_word_frac, out[3].top_bigram_frac) == (
        1 / 3, 0.0, 1 / 2,
    )
    assert (out[5].top_word_frac, out[5].dup_word_frac, out[5].top_bigram_frac) == (
        1.0, 1.0, 1.0,
    )


def test_dedup_text_entry_points_fan_out(spark):
    """Every dedup-tier text entry point must decouple its hash pipeline
    from scan granularity: on a narrow (1-partition) input the physical
    plan carries the explicit-count repartition (REPARTITION_BY_NUM —
    exempt from AQE coalescing), so a refactor can't silently reinstate
    the single-task shingle/token stage."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        minhash_signatures,
        shingle_containment_pairs,
        simhash64,
    )
    from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
        build_dedup_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i}") for i in range(50)],
        "doc_id long, text string",
    ).coalesce(1)
    for build in (
        lambda: minhash_signatures(docs, "doc_id", "text", k=4),
        lambda: simhash64(docs, "doc_id", "text"),
        lambda: shingle_containment_pairs(docs, "doc_id", "text"),
        lambda: build_dedup_index(docs, "doc_id", "text", k=4, bands=2),
    ):
        df = build()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan, plan[:2000]
    spark.catalog.clearCache()


def test_semantic_dedup_pair_kernel_pinned(spark):
    """Round 12: the O(cell^2) pair stage is one Arrow-batched per-cell
    kernel (FlatMapGroupsInPandas over the cell key) instead of the old
    salt-sliced interpreted-fold self-join — pin the plan node so a
    refactor can't silently reinstate the O(pairs·dim) join, and pin that
    the obsolete slice salt is gone. Semantics are unchanged (the kernel's
    raw sims are bit-exact vs the JVM fold; rounding + threshold filter
    stay JVM-side)."""
    df = _hot_cell_df(spark)
    out = semantic_dedup(df, "vec_id", "embedding", CENTS, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "__slice" not in plan, plan
    res = {r.vec_id: r.status for r in out.collect()}
    assert sum(1 for s in res.values() if s == "dropped") == 4
    assert res[4] == "kept" and res[11] == "kept"


@pytest.mark.parametrize("n_slices", [1, 2, 7])
def test_semantic_dedup_slice_count_invariance(spark, n_slices):
    """Results must be invariant in the slice count S — S only controls
    join parallelism, never which pairs form. S=1 is the unsalted plan;
    7 exercises a count that divides nothing evenly."""
    df = _hot_cell_df(spark)
    out = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup(
            df, "vec_id", "embedding", CENTS, threshold=0.9, n_slices=n_slices
        ).collect()
    }
    base = {
        r.vec_id: (r.cell, r.c_sim, r.status)
        for r in semantic_dedup(
            df, "vec_id", "embedding", CENTS, threshold=0.9
        ).collect()
    }
    assert out == base

