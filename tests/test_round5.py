"""Round-5 additions: cross-document span extraction, semantic dedup."""

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.text import cross_doc_repeated_spans
from datagouvfr_data_pipelines_spark.plans.lint import lint_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_spans_marks_only_cross_document_repeats(spark):
    # 7-gram "a b c d e f g" shared by docs 1 and 2; doc 3 repeats its own
    # 7-gram twice WITHIN itself only -> no cross-doc span.
    shared = "a b c d e f g"
    df = _docs(
        spark,
        [
            (1, f"x1 {shared} y1 z1"),
            (2, f"{shared} tail1 tail2 tail3"),
            (3, "p q r s t u v junk p q r s t u v"),
        ],
    )
    out = cross_doc_repeated_spans(df, "doc_id", "text", n=7).collect()
    by_doc = {(r.doc_id): r for r in out}
    assert set(by_doc) == {1, 2}
    # doc 1: tokens x1 a..g y1 z1 -> marked position 1, span [1, 8)
    assert (by_doc[1].span_start, by_doc[1].span_end, by_doc[1].span_words) == (
        1,
        8,
        7,
    )
    assert by_doc[2].span_start == 0 and by_doc[2].span_end == 7
    assert by_doc[1].n_grams == 1


def test_cross_doc_spans_merges_overlapping_and_touching_intervals(spark):
    # docs share a 10-token run -> positions 0..3 of doc 1 all marked
    # (n=7), overlapping intervals merge into ONE span [0, 10).
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = _docs(spark, [(1, f"{run} odd1 odd2"), (2, f"pre1 pre2 {run}")])
    out = {
        r.doc_id: r
        for r in cross_doc_repeated_spans(df, "doc_id", "text", n=7).collect()
    }
    assert (out[1].span_start, out[1].span_end) == (0, 10)
    assert out[1].span_words == 10 and out[1].n_grams == 4
    assert (out[2].span_start, out[2].span_end) == (2, 12)


def test_cross_doc_spans_separate_islands_stay_separate(spark):
    # two shared 7-gram regions separated by > n unshared tokens -> two rows
    s1, s2 = "a1 a2 a3 a4 a5 a6 a7", "b1 b2 b3 b4 b5 b6 b7"
    gap = " ".join(f"g{i}" for i in range(10))
    df = _docs(spark, [(1, f"{s1} {gap} {s2}"), (2, s1), (3, s2)])
    spans = [
        (r.span_start, r.span_end)
        for r in cross_doc_repeated_spans(df, "doc_id", "text", n=7)
        .where(F.col("doc_id") == 1)
        .collect()
    ]
    assert sorted(spans) == [(0, 7), (17, 24)]


def test_cross_doc_spans_portable_matches_xxhash(spark):
    df = _docs(
        spark,
        [
            (i, f"common c1 c2 c3 c4 c5 c6 filler{i} f2{i} f3{i}")
            for i in range(6)
        ],
    )
    fast = cross_doc_repeated_spans(df, "doc_id", "text", n=7, portable=False)
    port = cross_doc_repeated_spans(df, "doc_id", "text", n=7, portable=True)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, port.collect()))


def test_cross_doc_spans_plan_is_clean(spark):
    df = _docs(spark, [(1, "a b c d e f g h"), (2, "a b c d e f g h")])
    out = cross_doc_repeated_spans(df, "doc_id", "text", n=7)
    assert lint_plan(out) == []


def test_semantic_dedup_keep_farthest_rule(spark):
    from datagouvfr_data_pipelines_spark.functions.similarity import semantic_dedup

    # one cluster at (1,0), one at (-1,0). a and b are near-identical and
    # land in cluster 0; a is closer to the centroid -> a is dropped, the
    # farther b kept. c sits alone in cluster 1 -> kept.
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),       # a: exactly the centroid
            (2, [0.9, 0.2]),       # b: same direction, off-centroid
            (3, [-1.0, 0.1]),      # c: other cluster
        ],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    out = {
        r.vec_id: r
        for r in semantic_dedup(df, "vec_id", "embedding", cents, 0.9).collect()
    }
    assert out[1].status == "dropped" and out[2].status == "kept"
    assert out[3].status == "kept"
    assert out[1].cell == 0 and out[3].cell == 1


def test_semantic_dedup_tie_keeps_smaller_id(spark):
    from datagouvfr_data_pipelines_spark.functions.similarity import semantic_dedup

    # identical vectors: equal centroid cosine -> greatest id dropped
    df = spark.createDataFrame(
        [(7, [1.0, 0.0]), (9, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: r.status
        for r in semantic_dedup(
            df, "vec_id", "embedding", [[1.0, 0.0]], 0.9
        ).collect()
    }
    assert out == {7: "kept", 9: "dropped"}


def test_semantic_dedup_below_threshold_keeps_all(spark):
    from datagouvfr_data_pipelines_spark.functions.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, "vec_id", "embedding", [[1.0, 1.0]], 0.9)
    assert {r.status for r in out.collect()} == {"kept"}


def test_remove_cross_doc_spans_keeps_canonical_doc(spark):
    from datagouvfr_data_pipelines_spark.functions.text import (
        remove_cross_doc_spans,
    )

    shared = "a b c d e f g"
    df = _docs(
        spark,
        [
            (1, f"x1 {shared} y1"),
            (2, f"{shared} t1 t2 t3"),
            (3, "short text only"),
        ],
    )
    out = {
        r.doc_id: r
        for r in remove_cross_doc_spans(df, "doc_id", "text", n=7).collect()
    }
    # canonical (min-id) doc keeps its text verbatim (normalized form)
    assert out[1].n_removed_words == 0
    assert out[1].clean_text == f"x1 {shared} y1"
    # later doc loses the shared region, keeps the rest
    assert out[2].n_removed_words == 7
    assert out[2].clean_text == "t1 t2 t3"
    # untouched doc passes through
    assert out[3].n_removed_words == 0 and out[3].clean_text == "short text only"


def test_remove_cross_doc_spans_full_document_scrub(spark):
    from datagouvfr_data_pipelines_spark.functions.text import (
        remove_cross_doc_spans,
    )

    body = "w1 w2 w3 w4 w5 w6 w7"
    df = _docs(spark, [(5, body), (9, body)])
    out = {
        r.doc_id: r
        for r in remove_cross_doc_spans(df, "doc_id", "text", n=7).collect()
    }
    assert out[5].clean_text == body and out[5].n_removed_words == 0
    assert out[9].clean_text == "" and out[9].n_removed_words == 7


def test_charlm_nll_flags_divergent_text(spark):
    from datagouvfr_data_pipelines_spark.functions.text import charlm_nll_scores

    # corpus of ordinary English-ish text + one mojibake-like outlier:
    # the outlier's bigrams are rare in the corpus -> highest avg_nll
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    rows.append((99, "zq xv qz vx zzq qxz vvq"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_nll for r in charlm_nll_scores(df, "doc_id", "text").collect()}
    assert max(out, key=out.get) == 99
    # identical docs score identically
    assert len({round(out[i], 9) for i in range(8)}) == 1


def test_charlm_nll_handles_short_and_empty_docs(spark):
    from datagouvfr_data_pipelines_spark.functions.text import charlm_nll_scores

    df = spark.createDataFrame(
        [(1, "ab ab ab"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = charlm_nll_scores(df, "doc_id", "text").collect()
    # empty and single-char docs have no bigrams -> absent from the output
    assert {r.doc_id for r in out} == {1}
    assert out[0].n_bigrams == 7
