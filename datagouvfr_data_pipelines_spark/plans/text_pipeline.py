"""Training-data-pipeline query catalog: text analysis, dedup tiers,
embedding similarity (BASELINE.json north-star operators).

Oracle notes: DuckDB lambdas (`list_filter`, `list_reduce`, `list_transform`)
mirror Spark's higher-order functions exactly (left-to-right folds, same
interpolation), so even the rolling-hash fingerprint and cosine top-k are
hash-checkable. The MinHash/SimHash catalog queries run on the portable
hash family (rolling polynomial hashes + banded fold keys — round 4), so
their full pipelines are oracle-checked too; xxhash64 variants remain in
the operator library for callers preferring the native hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.similarity import cosine, ivf_cell
from datagouvfr_data_pipelines_spark.functions.text import (
    TOKEN_RE,
    char_shingles,
    fingerprint_rolling,
    fingerprint_sha,
    lang_id,
    lang_marker_score,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
)
from datagouvfr_data_pipelines_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_lsh_candidates,
)
from datagouvfr_data_pipelines_spark.plans.catalog import register, table

_STOPWORDS_SQL = "['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'on', 'for']"
_TOKENS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "t_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len({_TOKENS_SQL}) END AS INTEGER) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER) AS n_tokens_bpe,
           CAST(length(text) AS INTEGER) AS n_chars_actual
    FROM documents
    """,
    tags=["text", "token-count"],
)
def t_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex tokenizer — pure JVM
    regexp, no Python (generalizes activites text handling)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws("text").alias("n_tokens_ws"),
        token_count_bpe("text").alias("n_tokens_bpe"),
        F.length("text").cast("int").alias("n_chars_actual"),
    )


@register(
    "t_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST(len(list_filter({_TOKENS_SQL}, t -> list_contains({_STOPWORDS_SQL}, t))) AS DOUBLE)
             / greatest(len({_TOKENS_SQL}), 1) AS stopword_ratio,
           (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                        / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(len(list_filter({_TOKENS_SQL}, t -> list_contains({_STOPWORDS_SQL}, t))) AS DOUBLE)
                        / greatest(len({_TOKENS_SQL}), 1) BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
           ) / 3.0 AS quality
    FROM documents
    """,
    tags=["text", "quality"],
)
def t_quality_scores(spark, sf_dir):
    """Doc quality scoring: punctuation ratio, stopword ratio, composite
    C4-style score — all column expressions."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


def _marker_sql(code: str, markers: list[str]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter({_TOKENS_SQL}, t -> list_contains({arr}, t)))"


@register(
    "t_lang_id",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             {de} AS s_de, {en} AS s_en, {es} AS s_es, {fr} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang AS lang_declared,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM s
    """.format(
        de=_marker_sql("de", ["der", "die", "und", "das", "ist"]),
        en=_marker_sql("en", ["the", "and", "of", "to", "is"]),
        es=_marker_sql("es", ["el", "los", "que", "de", "y"]),
        fr=_marker_sql("fr", ["le", "la", "les", "et", "des"]),
    ),
    tags=["text", "lang-id"],
)
def t_lang_id(spark, sf_dir):
    """Deterministic n-gram/marker language heuristic (stand-in for
    langdetect, activites:45-49), reproducible in ANSI SQL."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        lang_id("text").alias("lang_pred"),
    )


def _trigram_values() -> str:
    from datagouvfr_data_pipelines_spark.functions.text import LANG_TRIGRAMS

    return ", ".join(
        f"('{lang}', '{tri}')"
        for lang, tris in sorted(LANG_TRIGRAMS.items())
        for tri in tris
    )


@register(
    "t_lang_id_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS c
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(length(c) - 2, 0)),
                                   i -> substr(c, i, 3))) AS tri
      FROM t
    ), s AS (
      SELECT doc_id, lang, COUNT(*) AS cnt
      FROM g JOIN (VALUES {_trigram_values()}) AS m(lang, tri) USING (tri)
      GROUP BY doc_id, lang
    ), best AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lang) AS rn
      FROM s
    )
    SELECT t.doc_id, COALESCE(b.lang, 'und') AS lang
    FROM t LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
    """,
    tags=["text", "lang-id"],
)
def t_lang_id_ngram(spark, sf_dir):
    """10-language char-trigram language ID (functions/text.py:lang_id_ngram):
    explode trigrams -> broadcast marker-table join -> per-doc argmax. The
    breadth upgrade over the 4-language marker heuristic of t_lang_id;
    same langdetect stand-in (activites:45-49), still SQL-reproducible."""
    from datagouvfr_data_pipelines_spark.functions.text import lang_id_ngram

    docs = table(spark, sf_dir, "documents")
    return lang_id_ngram(docs, "doc_id", "text")


@register(
    "mm_media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'text-blob' AS media_type,
           CAST(octet_length(encode('doc ' || text)) AS INTEGER) AS n_bytes,
           sha256('doc ' || text) AS sha,
           CAST(octet_length(encode('doc ' || text)) % 1920 AS INTEGER) AS width,
           CAST(octet_length(encode('doc ' || text)) % 1080 AS INTEGER) AS height,
           CAST(octet_length(encode('doc ' || text)) % 60000 AS INTEGER) AS duration_ms,
           CAST(NULL AS INTEGER) AS sample_rate,
           CAST(NULL AS INTEGER) AS channels,
           'fake-decoded' AS decode_status
    FROM documents WHERE doc_id < 200
    """,
    tags=["multimodal", "mapInPandas"],
)
def mm_media_metadata(spark, sf_dir):
    """Multimodal metadata plumbing, driver-checkable: text payloads cast to
    binary run through the real Arrow-batched mapInPandas decode path
    (functions/udfs.py:extract_media_metadata). Payloads are prefixed with
    'doc ' so NO text can start with an image magic number (a document
    beginning with 'BM' or 'GIF89a' would otherwise take the real-decode
    branch and break parity with the oracle's fake-decode arithmetic) —
    every row deterministically exercises the fake branch, which the
    DuckDB oracle reproduces exactly. Exercises the full UDF surface:
    batch iteration, binary columns, sha256, typed output schema."""
    from datagouvfr_data_pipelines_spark.functions.udfs import extract_media_metadata

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.concat(F.lit("doc "), F.col("text")).cast("binary").alias("content"),
        )
    )
    return extract_media_metadata(docs, "doc_id", "content", "text-blob")


@register(
    "mm_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, octet_length(encode('doc ' || text)) % 60000 AS dur
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id AS media_id,
           CAST(ts // 1000 AS INTEGER) AS frame_idx,
           CAST(ts AS BIGINT) AS ts_ms,
           'fake-decoded' AS decode_status
    FROM (SELECT doc_id, unnest(range(0, greatest(dur, 1), 1000)) AS ts FROM t)
    """,
    tags=["multimodal", "mapInPandas", "fanout"],
)
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling fan-out (functions/udfs.py:sample_frames): one input
    blob -> one row per sampled frame, Arrow-batched. Same 'doc ' prefix
    trick as mm_media_metadata so every payload takes the deterministic
    fake-decoder branch whose (frame_idx, ts_ms) arithmetic the oracle
    reproduces; the frame bytes themselves (real 2x2 BMPs) are covered by
    the unit test, not the oracle."""
    from datagouvfr_data_pipelines_spark.functions.udfs import sample_frames

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.concat(F.lit("doc "), F.col("text")).cast("binary").alias("content"),
        )
    )
    return sample_frames(docs, "doc_id", "content", every_ms=1000).select(
        "media_id", "frame_idx", "ts_ms", "decode_status"
    )


@register(
    "d_fingerprints",
    oracle="""
    SELECT doc_id,
           sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_sha,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 2147483647
           ) AS rolling_fp
    FROM documents
    """,
    tags=["text", "fingerprint"],
)
def d_fingerprints(spark, sf_dir):
    """Document fingerprinting: sha256 content hash + polynomial rolling
    hash (checksum family, utils/filesystem.py:106-114, engine-side)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_sha("text").alias("content_sha"),
        fingerprint_rolling("text").alias("rolling_fp"),
    )


@register(
    "d_exact_dedup",
    oracle="""
    SELECT sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_sha,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    tags=["dedup-exact"],
)
def d_exact_dedup(spark, sf_dir):
    """Exact dedup via content hash groupBy — one shuffle on the sha."""
    return exact_dedup(table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "d_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) - 2, 1)),
               i -> substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), CAST(i AS INTEGER), 3)
             )) AS sh
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """,
    tags=["dedup-ngram"],
)
def d_ngram_jaccard_pairs(spark, sf_dir):
    """Character-3-gram Jaccard similarity on a bounded pair set — the exact
    verify kernel used downstream of LSH candidates. (Pairwise only on a
    restricted id range: all-pairs is never the scale path.)"""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    sh = docs.select("doc_id", char_shingles("text", 3).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b"))).cast("double")
    return pairs.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    )


def _minhash_sig_oracle(k: int = 16) -> str:
    from datagouvfr_data_pipelines_spark.operators.dedup import _minhash_params

    perm_cols = ",\n           ".join(
        f"CAST(list_min(list_transform(hs, v -> ({a} * v + {b}) % 2147483647)) AS BIGINT) AS m{i}"
        for i, (a, b) in enumerate(_minhash_params(k, seed=42))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 300
    ), s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM t
    ), h AS (
      SELECT doc_id,
             list_transform(sh, sg -> list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(sg, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (acc, x) -> (acc * 131 + x) % 2147483647)) AS hs
      FROM h_src
    )
    SELECT doc_id,
           {perm_cols}
    FROM h
    """.replace("h_src", "s")


@register(
    "d_minhash_sig",
    oracle=_minhash_sig_oracle(16),
    tags=["dedup-minhash", "A-sig"],
)
def d_minhash_sig(spark, sf_dir):
    """Oracle-checked MinHash signatures (k=16) using the portable rolling
    shingle hash (operators/dedup.py:minhash_signatures_portable) — the
    driver-verifiable twin of the xxhash64 production path: identical
    shingling and permutation algebra, engine-portable hash. 16 scalar
    signature columns, bit-compared against the DuckDB replica."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        minhash_signatures_portable,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return minhash_signatures_portable(docs, "doc_id", "text", k=16)


def _simhash_sig_oracle() -> str:
    rolling = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
        "(acc, x) -> (acc * 131 + x) % 2147483647)"
    )
    bit_terms = " + ".join(
        f"CASE WHEN COALESCE(list_sum(list_transform(hs, "
        f"v -> CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(31)
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                            tok -> {rolling}) AS hs
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash31
    FROM t
    """


@register(
    "d_simhash_sig",
    oracle=_simhash_sig_oracle(),
    tags=["dedup-simhash", "A-sig"],
)
def d_simhash_sig(spark, sf_dir):
    """Oracle-checked SimHash fingerprints: the sign-sum construction with
    the portable rolling token hash (operators/dedup.py:simhash31_portable),
    bit-compared against a generated 31-term DuckDB replica — the simhash
    algebra's driver-verified twin (production simhash64 keeps xxhash64)."""
    from datagouvfr_data_pipelines_spark.operators.dedup import simhash31_portable

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return simhash31_portable(docs, "doc_id", "text")


def _minhash_neardup_oracle(
    k: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
    cap: int = 64,
    metric: str = "jaccard",
) -> str:
    """DuckDB replica of the FULL portable MinHash near-dup pipeline:
    shingle -> rolling hash -> k permutation minima -> banded fold keys ->
    capped-bucket candidates -> exact hashed-shingle verify (``metric``:
    jaccard |A∩B|/|A∪B| or containment |A∩B|/min(|A|,|B|))."""
    from datagouvfr_data_pipelines_spark.operators.dedup import _minhash_params

    rows = k // bands
    mins = ",\n             ".join(
        f"CAST(list_min(list_transform(hs, v -> ({a} * v + {b}) % 2147483647)) AS BIGINT)"
        for (a, b) in _minhash_params(k, seed=42)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
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
    ), bands AS (
      SELECT doc_id, r.b AS band,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 sig[CAST(r.b * {rows} + 1 AS INT) : CAST(r.b * {rows} + {rows} AS INT)]),
               (acc, x) -> (acc * 131 + x) % 2147483647) AS bh
      FROM sig CROSS JOIN range(0, {bands}) r(b)
    ), buckets AS (
      SELECT band, bh FROM bands GROUP BY band, bh
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets k
      JOIN bands a ON a.band = k.band AND a.bh = k.bh
      JOIN bands b ON b.band = k.band AND b.bh = k.bh AND a.doc_id < b.doc_id
    )
    SELECT * FROM (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
             / {{denom}} AS {metric}
      FROM cand c
      JOIN h ha ON ha.doc_id = c.id_a
      JOIN h hb ON hb.doc_id = c.id_b
    ) WHERE {metric} >= {threshold}
    """.format(
        denom=(
            "CAST(least(len(ha.hs), len(hb.hs)) AS DOUBLE)"
            if metric == "containment"
            else "CAST(len(list_distinct(list_concat(ha.hs, hb.hs))) AS DOUBLE)"
        )
    )


@register(
    "d_minhash_neardups",
    oracle=_minhash_neardup_oracle(),
    tags=["dedup-minhash"],
)
def d_minhash_neardups(spark, sf_dir):
    """MinHash+LSH near-dup pipeline: shingle -> 64-perm signature -> 8-band
    LSH candidates (capped buckets) -> exact Jaccard verify (threshold 0.5),
    using the fused operator that computes shingles once for both the
    signature and verify stages. Oracle-checked end to end (round 4): the
    portable hash family (rolling shingle hash + banded fold keys) makes
    every stage reproducible in DuckDB — same candidates, same verified
    pairs, bit-identical jaccard."""
    from datagouvfr_data_pipelines_spark.operators.dedup import near_duplicate_pairs

    docs = table(spark, sf_dir, "documents")
    return near_duplicate_pairs(
        docs, "doc_id", "text", k=64, bands=8, shingle_n=3, threshold=0.5,
        broadcast_candidates=True, portable=True,
    )


def _corpus_curation_oracle(
    min_quality: float = 0.3,
    threshold: float = 0.6,
    k: int = 64,
    bands: int = 8,
    cap: int = 64,
) -> str:
    """DuckDB replica of the curate_corpus composition used by the
    ``corpus_curation`` query: quality gate -> exact sha dedup -> portable
    MinHash near-dup pairs -> connected components (recursive min-label
    reachability == the alternating-star component minimum) -> survivors."""
    from datagouvfr_data_pipelines_spark.operators.dedup import _minhash_params

    rows = k // bands
    mins = ",\n             ".join(
        f"CAST(list_min(list_transform(hs, v -> ({a} * v + {b}) % 2147483647)) AS BIGINT)"
        for (a, b) in _minhash_params(k, seed=42)
    )
    punct = (
        "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
        " / greatest(length(text), 1)"
    )
    stop = (
        f"CAST(len(list_filter({_TOKENS_SQL}, t -> list_contains({_STOPWORDS_SQL}, t))) AS DOUBLE)"
        f" / greatest(len({_TOKENS_SQL}), 1)"
    )
    quality = f"""(CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN {punct} <= 0.2 THEN 1.0 ELSE 0.0 END
            + CASE WHEN {stop} BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END) / 3.0"""
    marker = {
        "de": ["der", "die", "und", "das", "ist"],
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "los", "que", "de", "y"],
        "fr": ["le", "la", "les", "et", "des"],
    }

    def _m(code):
        arr = "[" + ", ".join(f"'{m}'" for m in marker[code]) + "]"
        return f"len(list_filter({_TOKENS_SQL}, t -> list_contains({arr}, t)))"

    gmax = f"greatest({_m('de')}, {_m('en')}, {_m('es')}, {_m('fr')})"
    lang = f"""CASE WHEN {gmax} = 0 THEN 'und'
                WHEN {_m('de')} = {gmax} THEN 'de'
                WHEN {_m('en')} = {gmax} THEN 'en'
                WHEN {_m('es')} = {gmax} THEN 'es'
                ELSE 'fr' END"""
    return f"""
    WITH RECURSIVE ann AS (
      SELECT doc_id, text,
             {quality} AS quality,
             {lang} AS lang_pred,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len({_TOKENS_SQL}) END AS INTEGER) AS n_tokens,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS sha
      FROM documents
    ),
    q_ok AS (SELECT * FROM ann WHERE quality >= {min_quality}),
    keepers AS (SELECT sha, MIN(doc_id) AS kid FROM q_ok GROUP BY sha),
    e_ok AS (
      SELECT a.* FROM q_ok a
      JOIN keepers kk ON kk.sha = a.sha AND kk.kid = a.doc_id
    ),
    tk2 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM e_ok
    ),
    sgl AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM tk2
    ),
    hh AS (
      SELECT doc_id, list_distinct(list_transform(sh, sg -> list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(sg, ''), c -> CAST(ascii(c) AS BIGINT))),
          (acc, x) -> (acc * 131 + x) % 2147483647))) AS hs
      FROM sgl
    ),
    sg AS (
      SELECT doc_id, hs,
             [{mins}] AS sig
      FROM hh
    ),
    bnd AS (
      SELECT doc_id, r.b AS band,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 sig[CAST(r.b * {rows} + 1 AS INT) : CAST(r.b * {rows} + {rows} AS INT)]),
               (acc, x) -> (acc * 131 + x) % 2147483647) AS bh
      FROM sg CROSS JOIN range(0, {bands}) r(b)
    ),
    bkt AS (
      SELECT band, bh FROM bnd GROUP BY band, bh
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ),
    cnd AS (
      SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      FROM bkt
      JOIN bnd a ON a.band = bkt.band AND a.bh = bkt.bh
      JOIN bnd b2 ON b2.band = bkt.band AND b2.bh = bkt.bh
                  AND a.doc_id < b2.doc_id
    ),
    vrf AS (
      SELECT c.id_a, c.id_b FROM cnd c
      JOIN hh ha ON ha.doc_id = c.id_a
      JOIN hh hb ON hb.doc_id = c.id_b
      WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(ha.hs, hb.hs))) AS DOUBLE)
            >= {threshold}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM vrf
      UNION ALL SELECT id_b, id_a FROM vrf
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
      UNION
        SELECT e.dst, r2.lbl FROM reach r2 JOIN edges e ON e.src = r2.node
    ),
    losers AS (
      SELECT node FROM (
        SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
      ) WHERE component <> node
    )
    SELECT doc_id, quality, lang_pred, n_tokens FROM e_ok
    WHERE doc_id NOT IN (SELECT node FROM losers)
    """


@register(
    "corpus_curation",
    oracle=_corpus_curation_oracle(),
    tags=["pipeline", "flagship"],
)
def corpus_curation(spark, sf_dir):
    """North-star composition: quality filter -> exact dedup -> MinHash
    near-dup cluster removal over the documents table; returns the kept
    doc ids + annotations. Oracle-checked end to end (round 4): the
    portable near-dup hash family plus a recursive min-label reachability
    CTE (== the alternating-star component minimum) reproduce the whole
    composition in one DuckDB query."""
    from datagouvfr_data_pipelines_spark.pipelines.corpus import curate_corpus

    docs = table(spark, sf_dir, "documents")
    out = curate_corpus(
        docs, min_quality=0.3, neardup_threshold=0.6, portable_neardup=True
    )
    return out["kept"].select("doc_id", "quality", "lang_pred", "n_tokens")


def _simhash_neardup_oracle(max_hamming: int = 3, bands: int = 4, cap: int = 256) -> str:
    """DuckDB replica of the portable banded-Hamming SimHash search: 31-bit
    rolling-hash SimHash, ``bands`` bands over a 32-bit width, capped
    buckets, bit_count(xor) verify."""
    rolling = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
        "(acc, x) -> (acc * 131 + x) % 2147483647)"
    )
    bit_terms = " + ".join(
        f"CASE WHEN COALESCE(list_sum(list_transform(hs, "
        f"v -> CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(31)
    )
    width = 32 // bands
    mask = (1 << width) - 1
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                            tok -> {rolling}) AS hs
      FROM documents WHERE length(trim(text)) > 0
    ), f AS (
      SELECT doc_id, CAST({bit_terms} AS BIGINT) AS sig FROM t
    ), bands AS (
      SELECT doc_id, sig, r.b AS band,
             (sig >> CAST(r.b * {width} AS INT)) & {mask} AS bh
      FROM f CROSS JOIN range(0, {bands}) r(b)
    ), buckets AS (
      SELECT band, bh FROM bands GROUP BY band, bh
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sig AS sa, b.sig AS sb
      FROM buckets k
      JOIN bands a ON a.band = k.band AND a.bh = k.bh
      JOIN bands b ON b.band = k.band AND b.bh = k.bh AND a.doc_id < b.doc_id
    )
    SELECT DISTINCT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@register(
    "d_simhash_neardups",
    oracle=_simhash_neardup_oracle(),
    tags=["dedup-simhash"],
)
def d_simhash_neardups(spark, sf_dir):
    """SimHash banded-Hamming near-dup pairs (pigeonhole banding,
    bit_count(xor) verify). Oracle-checked end to end (round 4): the
    portable 31-bit rolling-hash SimHash (production explode/partial-agg
    shape — operators/dedup.py:simhash31_exploded) over 4x8-bit bands is
    fully reproducible in DuckDB."""
    from datagouvfr_data_pipelines_spark.operators.dedup import simhash_neardup_pairs

    docs = table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(
        docs, "doc_id", "text", max_hamming=3, portable=True
    )


def _km_dist(dim: int):
    """Squared-L2 sequential-fold SQL template over ``dim`` dims."""

    def dist(e: str, c: str) -> str:
        t = f"(CAST({e}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), i -> {t} * {t})), "
            f"(acc, x) -> acc + x)"
        )

    return dist


def _km_norm(dim: int):
    """L2-norm sequential-fold SQL template over ``dim`` dims."""

    def norm(e: str) -> str:
        return (
            f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> CAST({e}[i] AS DOUBLE) * CAST({e}[i] AS DOUBLE))), "
            f"(acc, x) -> acc + x))"
        )

    return norm


def _kmeans_af_ctes(k: int = 8, iterations: int = 2, dim: int = 64) -> str:
    """Shared DuckDB CTE chain replicating ``kmeans_fit(portable=True)``
    plus the final nearest-centroid assignment: ``WITH c0, (a_j,u_j,c_j)*,
    af`` where ``af`` is (vec_id, embedding, cell) and ``c{iterations}``
    holds the final centroids. Reused by the IVF-search and semantic-dedup
    oracles so the trainer replica lives in exactly one place."""
    dist = _km_dist(dim)
    lcg = "((((vec_id % 2147483647) * 1103515245 + 12345) % 2147483647) * 784588716 + 997) % 2147483647"
    parts = [
        f"""
    WITH c0 AS (
      SELECT cell, list_transform(c, v -> CAST(v AS DOUBLE)) AS c FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY {lcg}, vec_id) - 1 AS cell,
               embedding AS c
        FROM embeddings) WHERE cell < {k}
    )"""
    ]
    for j in range(1, iterations + 1):
        parts.append(
            f""",
    a{j} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e.embedding', 's.c')}, s.cell)
                 AS rn
        FROM embeddings e CROSS JOIN c{j - 1} s
      ) WHERE rn = 1
    ),
    u{j} AS (
      SELECT cell, i AS pos,
             SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000000.0)
                      AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM a{j} CROSS JOIN generate_series(1, {dim}) t(i)
      GROUP BY cell, i
    ),
    c{j} AS (
      SELECT s.cell, COALESCE(ua.c, s.c) AS c
      FROM c{j - 1} s LEFT JOIN (
        SELECT cell, list((s / n) / 1000000000.0 ORDER BY pos) AS c
        FROM u{j} GROUP BY cell
      ) ua USING (cell)
    )"""
        )
    cf = f"c{iterations}"
    parts.append(
        f""",
    af AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e.embedding', 's.c')}, s.cell)
                 AS rn
        FROM embeddings e CROSS JOIN {cf} s
      ) WHERE rn = 1
    )"""
    )
    return "".join(parts)


def _ivf_oracle(
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    n_probe: int = 3,
    top_k: int = 10,
    probe_id: int = 3,
) -> str:
    """DuckDB replica of the FULL portable IVF pipeline: LCG-seeded Lloyd's
    k-means (nano-quantized centroid updates), probe-cell ranking by the
    same sequential distance fold, cell-restricted cosine top-k."""
    dist = _km_dist(dim)
    norm = _km_norm(dim)

    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> CAST(af.embedding[i] AS DOUBLE) * CAST(pr.p[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )

    cf = f"c{iterations}"
    parts = [
        _kmeans_af_ctes(k=k, iterations=iterations, dim=dim),
        f""",
    pr AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {probe_id}),
    pcells AS (
      SELECT cell FROM {cf}, pr
      ORDER BY {dist(cf + '.c', 'pr.p')}, cell LIMIT {n_probe}
    )
    SELECT af.vec_id,
           round(CASE WHEN {norm('af.embedding')} = 0.0 OR {norm('pr.p')} = 0.0
                      THEN 0.0
                      ELSE {dot} / ({norm('af.embedding')} * {norm('pr.p')})
                 END, 6) AS sim
    FROM af, pr
    WHERE af.cell IN (SELECT cell FROM pcells)
    ORDER BY sim DESC, af.vec_id LIMIT {top_k}
    """,
    ]
    return "".join(parts)


@register(
    "sim_ivf_search",
    oracle=_ivf_oracle(),
    tags=["similarity", "ann"],
)
def sim_ivf_search(spark, sf_dir):
    """True-IVF ANN: k-means coarse quantizer (DataFrame Lloyd's) + n-probe
    cell-restricted cosine top-k. Oracle-checked end to end (round 4): the
    portable trainer (LCG-seeded init, floor(x*1e9) integer nano-unit
    centroid sums, same (s/n)/1e9 finishing expression) and the sequential
    distance folds reproduce every step — seeding, 2 Lloyd iterations,
    probe-cell choice, final cosine ranking — in one DuckDB query."""
    import pyspark.sql.functions as FF

    from datagouvfr_data_pipelines_spark.functions.similarity import (
        ivf_search,
        kmeans_fit,
    )

    emb = table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(
        emb, "embedding", k=8, iterations=2, portable=True, init_id_col="vec_id"
    )
    probe = [float(x) for x in emb.where(FF.col("vec_id") == 3).first()["embedding"]]
    return ivf_search(emb, "embedding", "vec_id", probe, centroids,
                      n_probe_cells=3, top_k=10)


def _simhash62_oracle() -> str:
    """DuckDB replica of the 62-bit two-base rolling-hash SimHash."""

    def _roll(base: int) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
            f"(acc, x) -> (acc * {base} + x) % 2147483647)"
        )

    stacked = f"({_roll(131)} + {_roll(137)} * CAST(2147483648 AS BIGINT))"
    bit_terms = " + ".join(
        f"CASE WHEN COALESCE(list_sum(list_transform(hs, "
        f"v -> CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(62)
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                            tok -> {stacked}) AS hs
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id AS doc, CAST({bit_terms} AS BIGINT) AS simhash62
    FROM t
    """


@register("d_simhash", oracle=_simhash62_oracle(), tags=["dedup-simhash"])
def d_simhash(spark, sf_dir):
    """62-bit SimHash fingerprints in the production explode/partial-agg
    shape (operators/dedup.py:simhash62_exploded) — one row per document.
    Oracle-checked (round 4): two stacked rolling token hashes replace
    xxhash64, so all 62 bits reproduce in DuckDB; the xxhash64 simhash64
    variant stays available for callers preferring the native hash."""
    from datagouvfr_data_pipelines_spark.operators.dedup import simhash62_exploded

    return simhash62_exploded(table(spark, sf_dir, "documents"), "doc_id", "text")


_DOT_SQL = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(e.embedding)),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.p[i] AS DOUBLE))),
      (acc, x) -> acc + x)"""
_NORM_E_SQL = """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(e.embedding)),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
      (acc, x) -> acc + x))"""
_NORM_P_SQL = """sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(generate_series(1, len(p.p)),
        i -> CAST(p.p[i] AS DOUBLE) * CAST(p.p[i] AS DOUBLE))),
      (acc, x) -> acc + x))"""


@register(
    "sim_topk_cosine",
    oracle=f"""
    WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({_DOT_SQL} / ({_NORM_E_SQL} * {_NORM_P_SQL}), 6) AS sim
    FROM embeddings e, p
    ORDER BY sim DESC, e.vec_id LIMIT 10
    """,
    tags=["similarity", "ann"],
)
def sim_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-k against a probe vector — the ANN baseline.
    The probe is ONE vector, so it collects to the driver (k-state
    policy, same as IVF centroids) and inlines as a literal array: the
    scan+TakeOrdered is then a single shuffle-free job — no probe
    subquery job, no crossJoin. Scale path is ivf/LSH cells below."""
    emb = table(spark, sf_dir, "embeddings")
    probe = (
        emb.where(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    )
    p = F.array(*[F.lit(float(v)) for v in probe])
    out = emb.select(
        "vec_id",
        "label",
        F.round(cosine("embedding", p), 6).alias("sim"),
    )
    return out.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(10)


@register(
    "sim_ivf_cells",
    oracle="""
    SELECT CAST(32 * (embedding[1] >= 0)::INT + 16 * (embedding[2] >= 0)::INT
         + 8 * (embedding[3] >= 0)::INT + 4 * (embedding[4] >= 0)::INT
         + 2 * (embedding[5] >= 0)::INT + (embedding[6] >= 0)::INT AS INTEGER) AS cell,
           COUNT(*) AS nb_vectors
    FROM embeddings GROUP BY 1
    """,
    tags=["similarity", "ivf"],
)
def sim_ivf_cells(spark, sf_dir):
    """IVF-style cell assignment histogram: sign-bit bucketing of leading
    dims — the partition key that bounds ANN search to one cell at scale."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.groupBy(ivf_cell("embedding", 64).alias("cell")).agg(
        F.count(F.lit(1)).alias("nb_vectors")
    )


@register(
    "t_repetition_scores",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKENS_SQL} AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    uc AS (
      SELECT doc_id, g, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(t) AS g FROM tk) GROUP BY doc_id, g
    ),
    ua AS (
      SELECT doc_id, max(c) AS mx, sum(c) AS tot,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
      FROM uc GROUP BY doc_id
    ),
    bc AS (
      SELECT doc_id, g, COUNT(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(t), 1)),
                                         i -> t[i] || ' ' || t[i+1])) AS g
            FROM tk) GROUP BY doc_id, g
    ),
    ba AS (SELECT doc_id, max(c) AS bmx, sum(c) AS btot FROM bc GROUP BY doc_id)
    SELECT ua.doc_id,
           CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) AS top_word_frac,
           CAST(dup AS DOUBLE) / CAST(tot AS DOUBLE) AS dup_word_frac,
           coalesce(CAST(bmx AS DOUBLE) / CAST(btot AS DOUBLE), 0.0) AS top_bigram_frac
    FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id
    """,
    tags=["text", "quality", "repetition"],
)
def t_repetition_scores(spark, sf_dir):
    """Gopher-style repetition filters (top-word / duplicated-word /
    top-bigram fractions) — the standard pre-training repetition gate,
    as two map-side-combinable explode+groupBy chains."""
    from datagouvfr_data_pipelines_spark.functions.text import repetition_stats

    docs = table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


@register(
    "t_pii_redact",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    s2 AS (
      SELECT doc_id, text, t1,
             regexp_replace(t1, '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2
      FROM s
    )
    SELECT doc_id,
           regexp_replace(t2, '\\+?[0-9]{2}[ .-]?([0-9]{2}[ .-]?){3}[0-9]{2}',
                          '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(t1,
                '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS INTEGER) AS n_ip,
           CAST(len(regexp_extract_all(t2,
                '\\+?[0-9]{2}[ .-]?([0-9]{2}[ .-]?){3}[0-9]{2}')) AS INTEGER) AS n_phone
    FROM s2
    """,
    tags=["text", "pii"],
)
def t_pii_redact(spark, sf_dir):
    """PII scrub: email/IPv4/phone redaction with typed placeholders and
    per-category match counts — single narrow projection, no shuffle
    (pinned by test_plan_quality.py:test_pii_redact_is_shuffle_free; a
    fan_out here trades that contract for ~0.1 s at sf0.1, measured and
    rejected)."""
    from datagouvfr_data_pipelines_spark.functions.text import pii_counts, redact_pii

    docs = table(spark, sf_dir, "documents")
    n_email, n_ip, n_phone = pii_counts("text")
    return docs.select(
        "doc_id",
        redact_pii("text").alias("clean_text"),
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
    )


@register(
    "sim_knn_join",
    oracle=f"""
    WITH p AS (
      SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT p.probe_id, e.vec_id,
             {_DOT_SQL} / ({_NORM_E_SQL} * {_NORM_P_SQL}) AS sim_raw
      FROM embeddings e, p
    ),
    ranked AS (
      SELECT probe_id, vec_id, sim_raw,
             row_number() OVER (
               PARTITION BY probe_id ORDER BY sim_raw DESC, vec_id ASC
             ) AS rank
      FROM scored
    )
    SELECT probe_id, vec_id, round(sim_raw, 6) AS sim, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
    tags=["similarity", "ann", "knn-join"],
)
def sim_knn_join(spark, sf_dir):
    """Batched exact k-NN join (5 probes x corpus, k=5) through the
    salted two-stage top-k — the oracle's single window proves the
    bucketed form exact."""
    from datagouvfr_data_pipelines_spark.functions.similarity import knn_join

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p")
    )
    return knn_join(emb, "embedding", "vec_id", probes, "probe_id", "p", k=5)


@register(
    "t_token_entropy",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), c AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY doc_id, tok
    ), e AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(floor(c * log2(c) * 1e9) AS BIGINT)) AS q
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tokens,
           round(log2(n) - (q / 1e9) / n, 6) AS token_entropy
    FROM e
    """,
    tags=["text", "quality", "entropy"],
)
def t_token_entropy(spark, sf_dir):
    """Unigram token entropy per document (functions/text.py:token_entropy)
    — perplexity-proxy quality signal; nano-unit-quantized float sum keeps
    the result partition-order independent and oracle-bit-identical."""
    from datagouvfr_data_pipelines_spark.functions.text import token_entropy

    docs = table(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text")


def _pinned_basis(k: int = 2, dim: int = 64) -> list[list[float]]:
    """Frozen orthonormal projection basis: rows 1..k of the dim-point
    Walsh-Hadamard matrix scaled by 1/sqrt(dim). Entries are exact dyadic
    doubles (+-0.125 at dim 64), so the pinned components carry ZERO
    text-round-trip or quantization risk across engines."""
    return [
        [
            (1.0 if bin(r & j).count("1") % 2 == 0 else -1.0) / dim ** 0.5
            for j in range(dim)
        ]
        for r in range(1, k + 1)
    ]


_PCA_DIM = 64
_PCA_COMPONENTS = _pinned_basis(k=2, dim=_PCA_DIM)


def _pca_project_oracle() -> str:
    comps_sql = [
        "[" + ", ".join(repr(x) for x in c) + "]" for c in _PCA_COMPONENTS
    ]

    def fold(comp: str) -> str:
        return (
            f"round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {_PCA_DIM}), "
            f"i -> (CAST(embedding[i] AS DOUBLE) - m.ml[i]) * ({comp})[i])), "
            f"(acc, x) -> acc + x), 4)"
        )

    return f"""
    WITH m AS MATERIALIZED (
      SELECT list((CAST(s AS DOUBLE) / n) / 1e9 ORDER BY pos) AS ml FROM (
        SELECT i AS pos,
               SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e9) AS BIGINT))
                 AS s,
               COUNT(*) AS n
        FROM embeddings, generate_series(1, {_PCA_DIM}) t(i)
        GROUP BY i)
    )
    SELECT vec_id, {fold(comps_sql[0])} AS p1, {fold(comps_sql[1])} AS p2
    FROM embeddings, m
    """


@register(
    "sim_pca_project",
    oracle=_pca_project_oracle(),
    tags=["similarity", "pca", "projection"],
)
def sim_pca_project(spark, sf_dir):
    """PCA-style dim-reduction projection in front of ANN, the production
    frozen-basis shape: at 100 TB the basis is fit OFFLINE on a sample
    (functions/similarity.py:pca_fit — numpy-parity and orthonormality
    pinned in tests/test_ann_simhash.py) and shipped as constants; the
    full-data pass is center-and-project only. The catalog query pins that
    projection path cross-engine with PINNED components (Walsh-Hadamard
    rows — exact dyadic doubles, so the constants are bit-identical in
    both engines) and the portable nano-quantized mean (the kmeans
    floor(x*1e9) update rule): both engines center by (sum_nano/n)/1e9 and
    fold (x_i - mean_i) * comp_i left-to-right in double. Oracle-checked
    since round 7 (previously rows-only under the fitted float
    eigenbasis, whose reduce-order jitter is not cross-engine pinnable)."""
    emb = table(spark, sf_dir, "embeddings")
    sums = (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * F.lit(1e9)).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    mean = [0.0] * _PCA_DIM
    for r in sums:
        mean[r["pos"]] = (r["s"] / r["n"]) / 1e9
    marr = F.array(*[F.lit(float(x)) for x in mean])
    v = F.col("embedding")

    def proj(comp: list[float]) -> F.Column:
        carr = F.array(*[F.lit(float(x)) for x in comp])
        return F.round(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(_PCA_DIM)),
                F.lit(0.0),
                lambda acc, i: acc
                + (F.element_at(v, i).cast("double") - F.element_at(marr, i))
                * F.element_at(carr, i),
            ),
            4,
        )

    return emb.select(
        "vec_id",
        proj(_PCA_COMPONENTS[0]).alias("p1"),
        proj(_PCA_COMPONENTS[1]).alias("p2"),
    )


_BLOCKLIST = ["slow", "spam", "junk", "garbage"]
_BLOCKLIST_SQL = "[" + ", ".join(f"'{w}'" for w in _BLOCKLIST) + "]"


@register(
    "t_blocklist_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter({_TOKENS_SQL},
                 t -> list_contains({_BLOCKLIST_SQL}, t))) AS INTEGER)
             AS n_blocked,
           CAST(len(list_filter({_TOKENS_SQL},
                 t -> list_contains({_BLOCKLIST_SQL}, t))) AS DOUBLE)
             / greatest(len({_TOKENS_SQL}), 1) AS blocked_frac,
           CAST(CASE WHEN CAST(len(list_filter({_TOKENS_SQL},
                 t -> list_contains({_BLOCKLIST_SQL}, t))) AS DOUBLE)
                 / greatest(len({_TOKENS_SQL}), 1) <= 0.05
                THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM documents
    """,
    tags=["text", "quality", "blocklist", "c4"],
)
def t_blocklist_filter(spark, sf_dir):
    """C4-style blocklist gate: per document, the count and fraction of
    tokens hitting a (broadcast literal) blocklist and the keep decision
    at a 5% ceiling — the dirty-word/boilerplate filter every public
    web-corpus recipe applies before dedup. Pure column expressions (the
    blocklist ships as an array literal; at a real blocklist's size swap
    the literal for a broadcast join on token) — no UDF, one scan."""
    from datagouvfr_data_pipelines_spark.functions.text import tokens

    docs = table(spark, sf_dir, "documents")
    tok = tokens("text")
    blocked = F.filter(
        tok, lambda t: t.isin(_BLOCKLIST)
    )
    n_blocked = F.size(blocked)
    frac = n_blocked.cast("double") / F.greatest(F.size(tok), F.lit(1))
    return docs.select(
        "doc_id",
        n_blocked.cast("int").alias("n_blocked"),
        frac.alias("blocked_frac"),
        (frac <= 0.05).cast("int").alias("kept"),
    )


@register(
    "d_dup_rate_curve",
    oracle=f"""
    WITH pairs AS ({_minhash_neardup_oracle(threshold=0.5)})
    SELECT CAST(FLOOR(jaccard * 10) AS INTEGER) AS jaccard_band,
           COUNT(*) AS n_pairs,
           CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_docs_droppable
    FROM pairs GROUP BY CAST(FLOOR(jaccard * 10) AS INTEGER)
    """,
    tags=["dedup-minhash", "analytics", "tuning"],
)
def d_dup_rate_curve(spark, sf_dir):
    """Dedup-rate-vs-threshold curve — the tuning artifact behind choosing
    a near-dup threshold at corpus scale: verified candidate pairs (one
    LSH+verify pass at the lowest threshold of interest) bucketed by
    jaccard band, with how many pairs and how many droppable docs each
    band contributes. One extra aggregation over the pair set the dedup
    pass already computes; run it once, pick the threshold, never rescan."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        near_duplicate_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = near_duplicate_pairs(
        docs, "doc_id", "text", k=64, bands=8, shingle_n=3, threshold=0.5,
        broadcast_candidates=True, portable=True,
    )
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("int").alias("jaccard_band")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("id_b").cast("bigint").alias("n_docs_droppable"),
    )
