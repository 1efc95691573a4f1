"""Training-corpus curation pipeline — the BASELINE.json north-star
composition: quality filter -> repetition gate -> language filter -> exact
dedup -> MinHash near-dup removal -> optional PII scrub -> corpus
statistics, end to end on the ``documents`` table.

Every stage is the operator library's scale path: column-expression
heuristics (no Python), hash-groupBy exact dedup, capped-bucket LSH, and a
greedy survivor selection that keeps the lowest doc id per near-dup cluster
(connected components via alternating large-star/small-star — converges
for arbitrarily deep duplicate chains in O(log^2 n) rounds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.text import (
    lang_id,
    quality_score,
    redact_pii,
    repetition_stats,
    token_count_ws,
)
from datagouvfr_data_pipelines_spark.operators.dedup import (
    content_hash,
    near_duplicate_pairs,
)
from datagouvfr_data_pipelines_spark.operators.graph import connected_components


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: list[str] | None = None,
    neardup_threshold: float = 0.8,
    max_cluster_iterations: int = 25,
    max_top_bigram_frac: float | None = None,
    max_dup_span_frac: float | None = None,
    dedup_lines: bool = False,
    scrub_pii: bool = False,
    model_quality_threshold: float | None = None,
    dsir_target_lang: str | None = None,
    dsir_min_micro_per_token: int = 0,
    portable_neardup: bool = False,
    preprocess_web: bool = False,
    boilerplate_domain_frac: float | None = None,
    boilerplate_min_pages: int = 3,
    domain_col: str = "domain",
) -> dict[str, DataFrame]:
    """Returns {"kept": curated docs, "dropped": per-stage drop ledger,
    "stats": one-row corpus stats}.

    The drop ledger records (doc_id, stage) for every removed document —
    the reference's report/synthesis habit (consolidation.py:1867-1949)
    applied to corpus curation.

    ``preprocess_web=True`` prepends the crawl-ingest stage: HTML-to-text
    extraction (``html_to_text``) then encoding repair
    (``fix_latin1_utf8`` — the cp1252/Latin-1 single-decode repair,
    a strict superset of ``fix_double_utf8`` on Latin-1-only text, so
    one application covers both mojibake classes), both gated
    pass-throughs on non-HTML / non-mojibake inputs — so raw crawl
    payloads and already-clean text run through the SAME pipeline.
    Documents whose text is empty after extraction (pure-markup pages)
    drop with their own ledger stage.

    ``boilerplate_domain_frac`` enables per-domain boilerplate line
    removal (``boilerplate_removal``) right after extraction: lines
    repeating on more than that fraction of a domain's pages (nav,
    cookie banners, footers) are stripped BEFORE any quality / dedup
    signal sees them; ``docs`` must then carry ``domain_col``. Pages
    left empty drop under the ``boilerplate`` ledger stage.
    """
    keep_domain = [F.col(domain_col)] if boilerplate_domain_frac is not None else []
    if preprocess_web:
        from datagouvfr_data_pipelines_spark.functions.text import (
            fix_latin1_utf8,
            html_to_text,
        )

        extracted = docs.select(
            F.col(id_col),
            *keep_domain,
            fix_latin1_utf8(html_to_text(F.col(text_col))).alias(text_col),
        )
        web_dropped = (
            extracted.where(F.length(F.trim(F.col(text_col))) == 0)
            .select(
                F.col(id_col).alias("doc_id"),
                F.lit("web_extract_empty").alias("stage"),
            )
        )
        docs = extracted.where(F.length(F.trim(F.col(text_col))) > 0)
    else:
        web_dropped = None

    bp_dropped = None
    if boilerplate_domain_frac is not None:
        from datagouvfr_data_pipelines_spark.functions.text import (
            boilerplate_removal,
        )

        cleaned = boilerplate_removal(
            docs,
            id_col,
            text_col,
            domain_col,
            max_domain_frac=boilerplate_domain_frac,
            min_pages=boilerplate_min_pages,
        )
        bp_dropped = (
            cleaned.where(F.length(F.trim(F.col("text_clean"))) == 0)
            .select(
                F.col(id_col).alias("doc_id"),
                F.lit("boilerplate").alias("stage"),
            )
        )
        docs = cleaned.where(F.length(F.trim(F.col("text_clean"))) > 0).select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )

    # C4 ordering: corpus-global line dedup rewrites documents FIRST, so
    # every downstream signal (quality, hashes, shingles) sees the cleaned
    # text; fully-deduplicated documents drop here with their own stage.
    ld_dropped = None
    if dedup_lines:
        from datagouvfr_data_pipelines_spark.functions.text import line_dedup

        cleaned = line_dedup(docs, id_col, text_col)
        survivors = cleaned.where(F.col("n_kept") > 0).select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )
        ld_dropped = (
            cleaned.where(F.col("n_kept") == 0)
            .select(F.col(id_col).alias("doc_id"), F.lit("line_dedup").alias("stage"))
        )
        docs = survivors

    annotated = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        token_count_ws(text_col).alias("n_tokens"),
        content_hash(text_col).alias("content_sha"),
    )

    q_ok = annotated.where(F.col("quality") >= min_quality)
    q_dropped = annotated.join(q_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("quality").alias("stage")
    )

    # Optional model-based quality gate (teacher-student): a logistic
    # regression distilled from the heuristic teacher (deterministic
    # nano-quantized training, functions/ml.py) re-scores the survivors
    # with a calibrated probability — borderline docs the hard heuristic
    # passed but the model finds teacher-unlike drop here with their own
    # ledger stage.
    if model_quality_threshold is not None:
        from datagouvfr_data_pipelines_spark.functions.ml import (
            logreg_fit,
            logreg_predict,
        )
        from datagouvfr_data_pipelines_spark.functions.text import (
            punct_ratio,
            stopword_ratio,
        )

        feats = ["f_len", "f_punct", "f_stop", "f_tokens"]
        feat_df = annotated.select(
            "doc_id",
            (F.length("text") / F.lit(1000.0)).alias("f_len"),
            punct_ratio("text").alias("f_punct"),
            stopword_ratio("text").alias("f_stop"),
            (F.col("n_tokens") / F.lit(200.0)).alias("f_tokens"),
            F.when(F.col("quality") >= min_quality, 1.0)
            .otherwise(0.0)
            .alias("teacher"),
        )
        wts = logreg_fit(feat_df, feats, "teacher", iters=30, lr=1.0)
        scored = logreg_predict(feat_df, wts, feats, out_col="p_good").select(
            "doc_id", "p_good"
        )
        m_ok = (
            q_ok.join(scored, "doc_id")
            .where(F.col("p_good") >= model_quality_threshold)
            .drop("p_good")
        )
        m_dropped = q_ok.join(m_ok, "doc_id", "left_anti").select(
            "doc_id", F.lit("model_quality").alias("stage")
        )
        q_ok = m_ok
    else:
        m_dropped = None

    # Gopher-style repetition gate: boilerplate-heavy docs out before the
    # expensive near-dup tier ever shingles them. Docs too short to have a
    # bigram carry no repetition signal and pass through (NULL-safe).
    if max_top_bigram_frac is not None:
        reps = repetition_stats(q_ok, "doc_id", "text").select(
            "doc_id", "top_bigram_frac"
        )
        r_ok = q_ok.join(reps, "doc_id", "left").where(
            F.col("top_bigram_frac").isNull()
            | (F.col("top_bigram_frac") <= max_top_bigram_frac)
        ).drop("top_bigram_frac")
    else:
        r_ok = q_ok
    r_dropped = q_ok.join(r_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("repetition").alias("stage")
    )

    if keep_langs:
        l_ok = r_ok.where(F.col("lang_pred").isin(keep_langs))
    else:
        l_ok = r_ok
    l_dropped = r_ok.join(l_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("language").alias("stage")
    )

    # exact dedup: keep min doc_id per content hash
    keepers = l_ok.groupBy("content_sha").agg(F.min("doc_id").alias("doc_id"))
    e_ok = l_ok.join(keepers, ["content_sha", "doc_id"], "left_semi")
    e_dropped = l_ok.join(e_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("exact_dup").alias("stage")
    )

    # duplicated-span gate: docs that are mostly 8-token spans shared with
    # the rest of the corpus are boilerplate composites — cheaper to drop
    # on the exact span signal than to let the LSH tier discover them
    if max_dup_span_frac is not None:
        from datagouvfr_data_pipelines_spark.functions.text import (
            duplicated_span_stats,
        )

        sp = duplicated_span_stats(e_ok, "doc_id", "text").select(
            "doc_id", "dup_span_frac"
        )
        s_ok = e_ok.join(sp, "doc_id", "left").where(
            F.col("dup_span_frac").isNull()
            | (F.col("dup_span_frac") <= max_dup_span_frac)
        ).drop("dup_span_frac")
    else:
        s_ok = e_ok
    s_dropped = e_ok.join(s_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("dup_spans").alias("stage")
    )
    e_ok = s_ok

    # near-dup clusters -> keep the minimum id of each cluster, via true
    # connected components (alternating star): every node of a cluster
    # collapses to the component min regardless of how deep the duplicate
    # chain runs, where bounded min-propagation under-merges V-shaped
    # clusters (a-c, b-c keeps both a and b)
    pairs = near_duplicate_pairs(
        e_ok,
        "doc_id",
        "text",
        threshold=neardup_threshold,
        portable=portable_neardup,
    ).select("id_a", "id_b")
    comp = connected_components(
        pairs, "id_a", "id_b", max_iterations=max_cluster_iterations
    )
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    nd_ok = e_ok.join(losers, "doc_id", "left_anti")
    nd_dropped = e_ok.join(nd_ok, "doc_id", "left_anti").select(
        "doc_id", F.lit("near_dup").alias("stage")
    )

    # Optional DSIR target-domain selection (LAST drop stage: weights are
    # computed over the deduplicated survivors so duplicate mass cannot
    # skew the source distribution). Target = docs the engine's own
    # lang_id assigns ``dsir_target_lang``; a document stays when its
    # per-token average importance (micro-nats) clears the floor. Docs
    # with no tokens carry no evidence and pass through.
    if dsir_target_lang is not None:
        from datagouvfr_data_pipelines_spark.operators.assembly import (
            dsir_importance_weights,
        )

        wts = dsir_importance_weights(
            nd_ok, "doc_id", "text", F.col("lang_pred") == dsir_target_lang
        )
        d_ok = (
            nd_ok.join(wts, "doc_id", "left")
            .where(
                F.col("dsir_micro").isNull()
                | (
                    F.col("dsir_micro")
                    >= F.lit(dsir_min_micro_per_token) * F.col("n_toks")
                )
            )
            .drop("n_toks", "dsir_micro")
        )
        d_dropped = nd_ok.join(d_ok, "doc_id", "left_anti").select(
            "doc_id", F.lit("dsir").alias("stage")
        )
        nd_ok = d_ok
    else:
        d_dropped = None

    dropped = (
        q_dropped.unionByName(r_dropped)
        .unionByName(l_dropped)
        .unionByName(e_dropped)
        .unionByName(s_dropped)
        .unionByName(nd_dropped)
    )
    if m_dropped is not None:
        dropped = dropped.unionByName(m_dropped)
    if d_dropped is not None:
        dropped = dropped.unionByName(d_dropped)
    if ld_dropped is not None:
        dropped = ld_dropped.unionByName(dropped)
    if bp_dropped is not None:
        dropped = bp_dropped.unionByName(dropped)
    if web_dropped is not None:
        dropped = web_dropped.unionByName(dropped)
    stats = nd_ok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum((F.col("quality") * 1e6).cast("long")).cast("double") / 1e6 / F.count(F.lit(1))).alias(
            "avg_quality"
        ),
    )
    kept = nd_ok.drop("content_sha")
    # PII scrub is a rewrite, not a drop stage: applied last so redaction
    # placeholders never perturb dedup hashes or repetition counts.
    if scrub_pii:
        kept = kept.withColumn("text", redact_pii("text"))
    return {"kept": kept, "dropped": dropped, "stats": stats}
