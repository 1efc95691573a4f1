"""Text-analysis column functions for the large-scale training-data pipeline.

Everything here is a pure JVM-side column expression (split / higher-order
array functions / regexp) — no Python UDFs, so the whole stage stays inside
whole-stage codegen and scales linearly with executors. The reference's
text surface (langdetect + spam-word match, utils/datagouv.py:21-72,
dgv/monitoring/activites/task_functions.py:35-51) is generalized into
deterministic heuristics suitable for 100 TB corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
ROLLING_HASH_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*131+c within int64
ROLLING_HASH_BASE = 131

# Tiny per-language stopword marker sets for the n-gram language heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "de", "y"],
}

STOPWORDS_EN = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text; empty string -> empty array."""
    c = F.lower(F.trim(_col(col)))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, "\\s+")
    )


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("int")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(_col(col), F.lit(TOKEN_RE), F.lit(0))).cast("int")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space chars."""
    c = _col(col)
    n_punct = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    return (n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double"))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are in the stopword list."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    tk = tokens(col)
    n_sw = F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))
    return n_sw.cast("double") / F.greatest(F.size(tk), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] doc-quality score: length band + low punctuation +
    healthy stopword rate. Deterministic; thresholds follow common
    web-corpus filtering practice (C4-style)."""
    c = _col(col)
    len_ok = F.when((F.length(c) >= 50) & (F.length(c) <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), 1.0).otherwise(0.0)
    return ((len_ok + punct_ok + sw_ok) / F.lit(3.0)).alias("quality")


def lang_marker_score(col: Column | str, lang_code: str) -> Column:
    """Count of tokens matching the marker set of ``lang_code``."""
    arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang_code]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def lang_id(col: Column | str) -> Column:
    """Deterministic marker-word language heuristic.

    Counts per-language marker tokens and picks the argmax ('und' when no
    marker matches; ties broken by language-code order). A stand-in for the
    reference's langdetect call (activites:45-49) that needs no Python lib
    and is exactly reproducible in ANSI SQL.
    """
    codes = sorted(LANG_MARKERS)
    scores = {lang_code: lang_marker_score(col, lang_code) for lang_code in codes}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang_code in reversed(codes):
        out = F.when(scores[lang_code] == best, F.lit(lang_code)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


# Characteristic char-trigrams (space-padded, lowercase) for the 10 most
# common Latin-script web languages. Standard n-gram language-ID technique
# (Cavnar & Trenkle '94 profile matching, reduced to a marker table):
# score(lang) = occurrences of that language's trigrams in the text,
# argmax wins. Overlapping trigrams (" de" in fr/de/es/pt/nl) are fine —
# the distinguishing ones provide the margin.
LANG_TRIGRAMS = {
    "de": ["der", " de", "die", " di", "und", " un", "ich", "ein", " ei",
           "cht", "sch", "ung", "gen", "ber", "ie "],
    "en": [" th", "the", "he ", "ing", "ng ", " an", "and", "nd ", " of",
           "of ", " to", "to ", " is", "is ", "ed "],
    "es": [" el", "el ", "los", " lo", "os ", "que", " qu", "ue ", "ión",
           " en", "en ", "ado", "ar ", "ien", "nte"],
    "fr": [" le", "le ", " la", " et", "et ", "es ", " de", "de ", "que",
           " qu", "ue ", "ait", "des", " un", "eur"],
    "it": [" di", "di ", "che", " ch", "he ", " il", "il ", "to ", "la ",
           "zio", "one", "ess", "per", " pe", "re "],
    "nl": ["het", " he", "et ", " de", "de ", "een", " ee", "en ", "van",
           " va", "an ", "aar", "ijk", "oor", "ver"],
    "pl": ["nie", " ni", "ie ", "prz", "rze", " po", "na ", " na", "ego",
           "go ", "ach", "ych", " wy", "się", "ość"],
    "pt": [" de", "de ", "ão ", "ção", "que", " qu", "ue ", "os ", " co",
           "om ", "um ", " um", "par", "ar ", "ade"],
    "ro": ["ul ", " în", "în ", "are", "ea ", " cu", "cu ", "ui ", " pe",
           "pe ", "ate", "lui", "tre", " tr", "şi "],
    "sv": ["och", " oc", "ch ", "att", " at", "tt ", "för", " fö", "ör ",
           "det", "en ", "ar ", "ing", "är ", "som"],
}


def char_trigrams_padded(col: Column | str) -> Column:
    """All char trigrams (WITH multiplicity) of ' '-padded normalized text.

    Zip-of-shifted-slices like ``char_shingles`` (no per-element substring
    of the whole text), but keeping duplicates — n-gram language scoring
    needs occurrence counts, not set membership.
    """
    c = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(_col(col))), "\\s+", " "),
        F.lit(" "),
    )
    chars = F.split(c, "")
    length = F.length(c) - 2
    acc = F.slice(chars, 1, length)
    for j in range(1, 3):
        acc = F.zip_with(acc, F.slice(chars, j + 1, length), lambda a, b: F.concat(a, b))
    return F.when(F.length(c) >= 3, acc).otherwise(F.array().cast("array<string>"))


def lang_id_ngram(df, id_col: str, text_col: str):
    """Char-trigram language ID over 10 languages — the scale form.

    Explode the text's trigrams, broadcast-join the (trigram, lang) marker
    table, count matches per (doc, lang), keep the argmax (ties broken by
    language code; docs with no match -> 'und'). One shuffle on the doc id;
    the marker table is a ~150-row broadcast. Returns (id_col, lang).

    The broadcast join FILTERS before the shuffle (only the ~150 marker
    trigrams survive the explode), and the argmax is a min-of-struct
    aggregate — (-cnt, lang) ascending = highest count, language-code
    tie-break — which combines map-side, instead of a sort-based window.

    Reference parity: utils/datagouv.py:21-72 + activites:45-49 call
    langdetect per row in Python; this reproduces the same n-gram scoring
    idea as a relational plan that is exactly reproducible in SQL.
    """
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, tri) for lang, tris in LANG_TRIGRAMS.items() for tri in tris],
        "lang string, tri string",
    )
    grams = df.select(
        F.col(id_col), F.explode(char_trigrams_padded(text_col)).alias("tri")
    )
    scores = (
        grams.join(F.broadcast(markers), "tri")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = (
        scores.groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("lang").alias("lang"))
            ).alias("b")
        )
        .select(id_col, F.col("b.lang").alias("lang"))
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(id_col, F.coalesce(F.col("lang"), F.lit("und")).alias("lang"))
    )


SPAM_WORDS = [
    "viagra", "casino", "crypto", "forex", "loan", "bet", "jackpot",
    "hack", "cheat", "free-money", "xxx",
]


def spam_score(col: Column | str, spam_words: list[str] | None = None) -> Column:
    """F4: spam detection — fraction of tokens (accent-folded, lowercased)
    matching the spam word list (utils/datagouv.py:21-72 word list applied
    at activites:35-51 after unidecode). Pure column expression."""
    from datagouvfr_data_pipelines_spark.operators.cleaning import fold_accents

    words = F.array(*[F.lit(w) for w in (spam_words or SPAM_WORDS)])
    tk = tokens(fold_accents(col))
    n_spam = F.size(F.filter(tk, lambda t: F.array_contains(words, t)))
    return n_spam.cast("double") / F.greatest(F.size(tk), F.lit(1)).cast("double")


def fingerprint_sha(col: Column | str) -> Column:
    """Normalized-content fingerprint: sha256 of lowercased collapsed text."""
    c = F.lower(F.trim(F.regexp_replace(_col(col), "\\s+", " ")))
    return F.sha2(c, 256)


def fingerprint_md5(col: Column | str) -> Column:
    """Content hash as a non-negative int64: first 60 bits of md5.

    The JVM-codegen replacement for ``fingerprint_rolling`` on LONG text:
    the per-character interpreted ``aggregate`` fold is O(len) but
    allocation-heavy (measured 6x slower than md5 on the 10x document
    sweep), while md5 runs inside whole-stage codegen at memory bandwidth.
    Oracle-reproducible in DuckDB as
    ``CAST(('0x' || substr(md5(c), 1, 15)) AS BIGINT)`` — both engines
    hash the UTF-8 bytes and emit lowercase hex, and 15 hex digits
    (60 bits) always fit int64. NULL in -> NULL out on both sides.
    Use ``fingerprint_rolling`` only where the rolling-polynomial algebra
    itself is the point (shingle composition, d_fingerprints parity)."""
    return F.conv(F.substring(F.md5(_col(col)), 1, 15), 16, 10).cast("long")


def fingerprint_rolling(col: Column | str) -> Column:
    """Polynomial rolling hash over codepoints, mod 2^31-1.

    Oracle-reproducible (plain arithmetic fold) unlike xxhash64; used for
    cheap grouping fingerprints where crypto strength is wasted.
    """
    chars = F.split(_col(col), "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * ROLLING_HASH_BASE + x, F.lit(ROLLING_HASH_MOD)),
    )


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text (array<string>).

    Zip-of-shifted-slices form for the same reason as ``word_shingles``:
    ``substring(c, i, n)`` inside a transform lambda re-normalizes the whole
    text per gram (O(len²) interpreted work). Texts shorter than ``n``
    yield the whole text, matching ``substr``'s clipping behavior.
    """
    c = F.lower(F.regexp_replace(_col(col), "\\s+", " "))
    chars = F.split(c, "")
    length = F.length(c) - (n - 1)
    acc = F.slice(chars, 1, length)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(chars, j + 1, length), lambda a, b: F.concat(a, b)
        )
    return F.when(F.length(c) >= n, F.array_distinct(acc)).otherwise(F.array(c))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>); short docs -> whole text.

    Built by zipping n shifted slices of the token array rather than indexing
    ``element_at(tk, i+j)`` inside the per-element lambda: higher-order
    functions are interpreted (no codegen), so a lambda that references the
    token array per element re-evaluates the whole split per shingle —
    measured 10x slower on ~50-shingle docs. The zip form evaluates the
    token array a constant number of times per row.

    The whole construction is wrapped in ``transform(array(tokens), tk ->
    ...)`` so the tokenizing split binds to a lambda variable evaluated ONCE
    per row; referencing ``tokens(col)`` directly from the n+2 slice/size
    sites re-runs the regex split at each site (interpreted higher-order
    expressions get no subexpression elimination) — measured ~35% slower at
    sf0.1.
    """

    def _assemble(tk):
        length = F.size(tk) - (n - 1)
        acc = F.slice(tk, 1, length)
        for j in range(1, n):
            acc = F.zip_with(
                acc, F.slice(tk, j + 1, length), lambda a, b: F.concat_ws(" ", a, b)
            )
        return F.when(F.size(tk) >= n, F.array_distinct(acc)).otherwise(
            F.array(F.concat_ws(" ", tk))
        )

    return F.transform(F.array(tokens(col)), _assemble)[0]


# --- repetition / PII operators (training-data curation tier) -------------

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+?[0-9]{2}[ .-]?([0-9]{2}[ .-]?){3}[0-9]{2}"


def bigram_list(tk: Column) -> Column:
    """Word bigrams WITH multiplicity (unlike ``word_shingles``, which
    deduplicates for MinHash). Zip-of-shifted-slices, same rationale as
    ``word_shingles``; <2 tokens -> empty array."""
    length = F.size(tk) - 1
    return F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, 1, length),
            F.slice(tk, 2, length),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style within-document repetition ratios:

    - ``top_word_frac``: occurrences of the most frequent token / all tokens
    - ``dup_word_frac``: fraction of tokens whose token occurs more than once
    - ``top_bigram_frac``: same as top_word_frac over word bigrams

    Shape for 100 TB: ONE explode over the fused unigram+bigram stream ->
    (doc, gram) count -> per-doc aggregate. Unigrams and bigrams share the
    pipeline because they can't collide: tokens are whitespace-split so a
    unigram never contains a space, while every bigram does — `g` carries
    its own tag, so one groupBy chain computes both stat families and the
    uni/bigram join disappears (half the scans/shuffles of the naive
    two-chain form). Both groupBys are keyed by doc_id(+gram) so they
    partial-aggregate map-side; no document's grams ever need to be
    co-resident beyond one (doc, gram) pair, so arbitrarily long documents
    can't skew a reducer the way a per-doc collect_list would. A
    single-token doc has no bigram rows: its bigram max/sum aggregate to
    NULL and top_bigram_frac coalesces to 0.0, matching the oracle's LEFT
    JOIN. Docs with zero tokens are excluded (no signal), matching the
    oracle's inner unnest. fan_out decouples the tokenize+explode stage
    from scan granularity (no-op at scale).
    """
    from datagouvfr_data_pipelines_spark.session import fan_out

    # round 12: the fan hashes on the doc id — explode preserves the
    # partitioning and HashPartitioning(id) satisfies both doc-keyed
    # groupBys' clustered distributions, so the one explicit exchange
    # replaces three (round-robin fan + two groupBy shuffles)
    toks = fan_out(df.select(id_col, text_col), id_col).select(
        id_col, tokens(text_col).alias("__t")
    )
    is_big = F.col("g").contains(" ")
    return (
        toks.select(
            id_col,
            F.explode(F.concat(F.col("__t"), bigram_list(F.col("__t")))).alias("g"),
        )
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max(F.when(~is_big, F.col("c"))).alias("mx"),
            F.sum(F.when(~is_big, F.col("c")).otherwise(F.lit(0))).alias("tot"),
            F.sum(
                F.when(~is_big & (F.col("c") > 1), F.col("c")).otherwise(F.lit(0))
            ).alias("dup"),
            F.max(F.when(is_big, F.col("c"))).alias("bmx"),
            F.sum(F.when(is_big, F.col("c"))).alias("btot"),
        )
        .select(
            id_col,
            (F.col("mx").cast("double") / F.col("tot").cast("double")).alias(
                "top_word_frac"
            ),
            (F.col("dup").cast("double") / F.col("tot").cast("double")).alias(
                "dup_word_frac"
            ),
            F.coalesce(
                F.col("bmx").cast("double") / F.col("btot").cast("double"),
                F.lit(0.0),
            ).alias("top_bigram_frac"),
        )
    )


def token_entropy(df, id_col: str, text_col: str):
    """Per-document Shannon entropy of the unigram token distribution — a
    cheap perplexity proxy for corpus quality gates: near-zero entropy is
    boilerplate/repetition, unusually high entropy is gibberish; natural
    text sits in a band.

    Same 100 TB shape as ``repetition_stats``: explode -> (doc, token)
    count -> per-doc aggregate, both groupBys partial-aggregate map-side.
    Uses H = log2(N) - (sum c*log2 c)/N so the per-term division never
    happens; the float sum is quantized to integer nano-units before
    aggregation (the engine's float-determinism policy — a raw double sum
    is partition-order dependent) and the result rounded to 1e-6, which is
    what makes the DuckDB oracle bit-identical. Zero-token docs are
    excluded (no signal). Returns (id, n_tokens, token_entropy).
    """
    counts = (
        df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = F.sum(F.floor(F.col("c") * F.log2("c") * F.lit(1e9)).cast("long"))
    n = F.sum("c")
    return counts.groupBy(id_col).agg(
        n.cast("long").alias("n_tokens"),
        F.round(F.log2(n) - (q / F.lit(1e9)) / n, 6).alias("token_entropy"),
    )


def redact_pii(col: Column | str) -> Column:
    """Scrub emails, IPv4 addresses and FR-style phone numbers with typed
    placeholders. Pure regexp_replace chain (JVM, codegen); patterns stay in
    the Java/RE2 common subset so the DuckDB oracle replays them verbatim.
    Order matters (emails first: an IP-lookalike inside a hostname must not
    be eaten before the email match sees it) and is mirrored in the oracle."""
    c = F.regexp_replace(_col(col), EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def pii_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_email, n_ip, n_phone) match counts, each counted on the text with
    the previous categories already redacted so a token is attributed to
    exactly one category — same cascade as ``redact_pii``."""
    c = _col(col)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_email = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("int")
    n_ip = F.size(
        F.regexp_extract_all(after_email, F.lit(IPV4_RE), F.lit(0))
    ).cast("int")
    n_phone = F.size(
        F.regexp_extract_all(after_ip, F.lit(PHONE_RE), F.lit(0))
    ).cast("int")
    return n_email, n_ip, n_phone


def line_dedup(df, id_col: str, text_col: str, sep: str = "\n"):
    """C4-style corpus-global line deduplication: keep only the FIRST
    occurrence of each exact line across the corpus (total order = (doc id,
    line position)), reassemble documents from their surviving lines.

    Scale shape: posexplode (shuffle-free) -> one window shuffle keyed by
    the line text itself (first-occurrence rank; skewed boilerplate lines
    fall to AQE) -> one groupBy(doc) reassembly. Returns
    (id, text_clean, n_lines, n_kept); a fully-deduplicated document comes
    back with ``text_clean = ''`` so the caller's quality gate can drop it.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col), F.posexplode(F.split(_col(text_col), sep)).alias("pos", "line")
    )
    w = Window.partitionBy("line").orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    ranked = lines.withColumn("__first", F.row_number().over(w) == 1)
    return ranked.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__first"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__first").cast("long")).alias("n_kept"),
    )


def boilerplate_removal(
    df,
    id_col: str,
    text_col: str,
    domain_col: str,
    max_domain_frac: float = 0.5,
    min_pages: int = 3,
    sep: str = "\n",
):
    """Per-domain boilerplate line removal — the web-corpus stage between
    HTML extraction and quality scoring: a line is boilerplate when its
    document frequency WITHIN a domain exceeds ``max_domain_frac`` of the
    domain's pages (nav bars, cookie banners, footers repeat on every
    page of a site; body text does not). Domains with fewer than
    ``min_pages`` pages carry no frequency evidence and are left intact.
    Blank lines are structure, not boilerplate — never counted, never
    dropped.

    Scale shape (no pair expansion): one posexplode, one distinct +
    groupBy keyed on (domain, line) for per-domain document frequency,
    one count per domain, then a (domain, line)-keyed left join to mark
    flagged lines — the flagged side is aggregation-shrunk to the
    boilerplate lines themselves, so AQE broadcasts it in practice —
    and the same groupBy(doc) reassembly as ``line_dedup``. Returns
    (id, text_clean, n_lines, n_kept); a fully-boilerplate page comes
    back with ``text_clean = ''`` for the caller's drop ledger.

    ``sep`` is a Java REGEX (it feeds ``F.split``, same contract as
    ``line_dedup``): a literal separator like ``.`` or ``|`` must be
    escaped (``\\.``, ``\\|``) or it splits on every character.
    """
    lines = df.select(
        F.col(id_col),
        F.col(domain_col),
        F.posexplode(F.split(_col(text_col), sep)).alias("pos", "line"),
    )
    pages = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__pages"))
    freq = (
        lines.where(F.length(F.trim(F.col("line"))) > 0)
        .select(domain_col, "line", id_col)
        .distinct()
        .groupBy(domain_col, "line")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    flagged = (
        freq.join(pages, domain_col)
        .where(
            (F.col("__pages") >= F.lit(min_pages))
            & (F.col("__df") > F.lit(max_domain_frac) * F.col("__pages"))
        )
        .select(domain_col, "line", F.lit(True).alias("__bp"))
    )
    marked = lines.join(flagged, [domain_col, "line"], "left")
    keep = F.col("__bp").isNull()
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "line")))
                ),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
    )


def bigram_lm_scores(df, id_col: str, text_col: str, vocab_size: int):
    """Bigram language-model scoring with add-one smoothing, trained on the
    corpus itself: per-document mean log2 P(w_i | w_{i-1}) — the classic
    n-gram perplexity quality signal (low = natural for the corpus,
    very low = boilerplate, high = gibberish).

    ``vocab_size`` is the corpus distinct-token count (a driver scalar —
    same policy as k-means centroids: k-sized state may cross the driver).

    Float determinism: each term is log2(c12 + 1) - log2(c1 + V) — log2 of
    exact INTEGERS only (JVM and DuckDB agree bit-wise on those, proven by
    ``token_entropy``), then nano-quantized before the per-doc sum, so the
    result is partition-order independent and oracle-bit-identical.

    Scale shape: explode bigrams once, cache-free two-branch reuse is
    avoided by deriving unigram context counts FROM the bigram counts
    (sum over w2) — one wide shuffle on the bigram key, one narrow re-agg
    on w1, one shuffle join back to doc bigrams. All aggs partial.
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__t")).where(
        F.size("__t") >= 2
    )
    doc_bg = toks.select(
        F.col(id_col), F.explode(bigram_list(F.col("__t"))).alias("g")
    ).withColumn("w1", F.split(F.col("g"), " ", 2)[0])
    bg_counts = doc_bg.groupBy("g").agg(F.count(F.lit(1)).alias("c12"))
    # context count = occurrences of w1 as a bigram PREFIX (standard bigram
    # MLE denominator over the same event space as the numerator)
    ctx_counts = (
        bg_counts.withColumn("w1", F.split(F.col("g"), " ", 2)[0])
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    term = F.log2(F.col("c12") + 1) - F.log2(F.col("c1") + F.lit(vocab_size))
    scored = (
        doc_bg.join(bg_counts, on="g")
        .join(ctx_counts, on="w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.floor(term * F.lit(1e9)).cast("long")).alias("__q"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        F.round((F.col("__q") / F.lit(1e9)) / F.col("n_bigrams"), 6).alias(
            "avg_log2_prob"
        ),
    )


def ngram_list(tk: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity and positions preserved (generalizes
    ``bigram_list``); <n tokens -> empty array. Built as a JVM transform
    over an index sequence — no UDF, no explode fan-out until the caller
    asks for it."""
    length = F.size(tk) - (n - 1)
    return F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duplicated_span_stats(df, id_col: str, text_col: str, n: int = 8):
    """Within-corpus duplicated-span detection (the signal behind
    suffix-array training-data dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" — public method, n-gram
    approximation): an n-token span is "duplicated" when its exact text
    occurs more than once across the corpus. Returns per-document
    (n_spans, n_dup_spans, dup_span_frac) for quality gating — a high
    fraction means the document is mostly boilerplate shared with others.

    Scale shape: one explode -> groupBy(span) count (partial-agg; the span
    string is the key, skewed boilerplate spans fall to AQE) -> join back
    -> per-doc aggregate. The integer-ratio output is exact-binary double,
    so the DuckDB oracle hash-matches without quantization.
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__t")).where(
        F.size("__t") >= n
    )
    spans = toks.select(
        F.col(id_col), F.explode(ngram_list(F.col("__t"), n)).alias("g")
    )
    counts = spans.groupBy("g").agg(F.count(F.lit(1)).alias("__c"))
    return (
        spans.join(counts, on="g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__c") > 1).cast("long")).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_frac",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
        )
    )


def tfidf_weights(df, id_col: str, text_col: str, n_docs: int):
    """TF-IDF term weights per (document, token): tf * (ln(N+1) - ln(df+1)
    + 1) with add-one smoothing. ``n_docs`` is the corpus size (driver
    scalar, one count job — k-state policy).

    Determinism: tf and df are integers and ln stays on INTEGER inputs, so
    weights are bit-identical in the DuckDB oracle. Scale shape: one
    explode -> (doc, tok) count -> token-keyed df re-agg (derived FROM the
    tf counts, no second corpus scan) -> join back. All partial-agg.
    """
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(float(n_docs + 1))) - F.log(F.col("df") + 1) + F.lit(1.0)
    return tf.join(dfreq, on="tok").select(
        F.col(id_col),
        "tok",
        F.col("tf"),
        F.col("df"),
        (F.col("tf") * idf).alias("tfidf"),
    )


def tfidf_cosine_pairs(
    weights, id_col: str, min_cosine: float = 0.5
):
    """All-pairs sparse cosine similarity over TF-IDF vectors through the
    INVERTED INDEX: pairs only materialize for documents sharing a token
    (one shuffle on the token key), never as an all-pairs cartesian — the
    lexical twin of the embedding near-dup tier.

    Determinism: per-token partial products and per-doc squared norms are
    nano-quantized before their float sums (engine policy), so cosine is
    bit-identical across shuffle orders and in the DuckDB oracle. Skewed
    stop-tokens are the hot keys here — run AFTER a df-based stopword cut
    (or quality gate) at the 100 TB tier.
    """
    w = weights.select(
        F.col(id_col).alias("id"), "tok", F.col("tfidf").cast("double").alias("w")
    )
    norms = w.groupBy("id").agg(
        (
            F.sum(F.floor(F.col("w") * F.col("w") * F.lit(1e9)).cast("long"))
            / F.lit(1e9)
        ).alias("norm2")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, on="tok")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            (
                F.sum(
                    F.floor(F.col("a.w") * F.col("b.w") * F.lit(1e9)).cast("long")
                )
                / F.lit(1e9)
            ).alias("dot")
        )
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm2").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm2").alias("nb"))
    return (
        dots.join(na, on="id_a")
        .join(nb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot") / (F.sqrt("na") * F.sqrt("nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def cross_doc_repeated_spans(
    df,
    id_col: str,
    text_col: str,
    n: int = 7,
    min_docs: int = 2,
    portable: bool = False,
    keep_first: bool = False,
):
    """Merged duplicated-text SPANS shared across documents — the
    extraction step of suffix-array-style training-data dedup (Lee et al.
    2022, n-gram approximation): every word position whose n-gram occurs
    in >= ``min_docs`` DISTINCT documents is marked, and overlapping or
    touching marked intervals ``[pos, pos+n)`` are merged per document
    into maximal spans. Unlike :func:`duplicated_span_stats` (per-doc
    fractions, any repetition incl. within-doc) this returns the actual
    REMOVABLE regions — one row per (document, span) with word offsets —
    and only counts cross-document sharing.

    Returns (id, span_start, span_end, span_words, n_grams): 0-based word
    offsets, end exclusive, ``n_grams`` = marked positions merged into the
    span. Two marked positions join one span when ``pos - prev <= n``
    (intervals overlap or touch).

    ``keep_first=True`` switches from detection to REMOVAL-marking
    semantics: positions in a gram's canonical document (its smallest id)
    are never marked. Note marking alone does NOT guarantee keep-one under
    overlapping grams with different canonical docs — the cut step must
    additionally protect canonical token RANGES, which
    :func:`remove_cross_doc_spans` does.

    Scale shape: posexplode -> groupBy(gram key) distinct-doc count
    (partial-agg, two-phase) -> shuffle semi-join back -> per-DOCUMENT
    window for the interval merge (bounded by doc length, never global).
    Linear end to end: no pair expansion at any point, so no bucket caps
    are needed. ``portable=False`` (default) keys grams by xxhash64;
    ``portable=True`` groups on the raw gram string so a DuckDB oracle
    reproduces every step.
    """
    from pyspark.sql.window import Window

    hits = _cross_doc_marked_positions(
        df, id_col, text_col, n, min_docs, portable, keep_first
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = F.when(prev.isNull() | (F.col("pos") - prev > n), 1).otherwise(0)
    return (
        hits.withColumn("__i", F.sum(brk).over(w))
        .groupBy(F.col(id_col), "__i")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_words"),
            "n_grams",
        )
    )


def _cross_doc_marked_positions(
    df,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int,
    portable: bool,
    keep_first: bool,
):
    """(id, pos) rows for every word position whose n-gram is shared by
    >= ``min_docs`` distinct documents; with ``keep_first`` the gram's
    canonical (smallest-id) document is exempt. Shared by the span
    detector and the span remover."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    # NOTE (round 13, measured): persisting ``grams`` here — as
    # _cross_doc_positions_with_canon now does — was A/B-measured a small
    # LOSS for the span DETECTOR (+0.13 s pooled over 5 interleaved
    # rounds): this plan's gram subtree already shares its exchange across
    # the two consumers, so the cache only adds a materialization barrier.
    toks = fan_out(
        df.select(F.col(id_col), tokens(text_col).alias("__t")).where(
            F.size("__t") >= n
        ),
        id_col,
    )
    grams = toks.select(
        F.col(id_col), F.posexplode(ngram_list(F.col("__t"), n)).alias("pos", "g")
    )
    key = F.col("g") if portable else F.xxhash64("g")
    grams = grams.select(F.col(id_col), "pos", key.alias("__k"))
    shared = (
        grams.groupBy("__k")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__nd"),
            F.min(F.col(id_col)).alias("__first_doc"),
        )
        .where(F.col("__nd") >= min_docs)
    )
    if keep_first:
        return (
            grams.join(shared.select("__k", "__first_doc"), "__k")
            .where(F.col(id_col) != F.col("__first_doc"))
            .select(F.col(id_col), "pos")
        )
    return grams.join(shared.select("__k"), "__k", "leftsemi").select(
        F.col(id_col), "pos"
    )


def _cross_doc_positions_with_canon(
    df,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int,
    portable: bool,
):
    """(id, pos, __canon) rows for every word position whose n-gram is
    shared by >= ``min_docs`` distinct documents; ``__canon`` is true when
    this document is the gram's canonical (smallest-id) sharer. One gram
    scan, one two-phase distinct-doc aggregate, one shuffle join — the
    remover splits marked vs protected positions from this single pass."""
    from datagouvfr_data_pipelines_spark.session import fan_out

    from pyspark import StorageLevel

    toks = fan_out(
        df.select(F.col(id_col), tokens(text_col).alias("__t")).where(
            F.size("__t") >= n
        ),
        id_col,
    )
    grams = toks.select(
        F.col(id_col), F.posexplode(ngram_list(F.col("__t"), n)).alias("pos", "g")
    )
    key = F.col("g") if portable else F.xxhash64("g")
    # Round 13: same two-consumer persist as _cross_doc_marked_positions —
    # the tokenize + ngram explode otherwise runs once per plan branch.
    grams = grams.select(F.col(id_col), "pos", key.alias("__k")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    shared = (
        grams.groupBy("__k")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__nd"),
            F.min(F.col(id_col)).alias("__first_doc"),
        )
        .where(F.col("__nd") >= min_docs)
    )
    return grams.join(shared.select("__k", "__first_doc"), "__k").select(
        F.col(id_col),
        "pos",
        (F.col(id_col) == F.col("__first_doc")).alias("__canon"),
    )


def remove_cross_doc_spans(
    df,
    id_col: str,
    text_col: str,
    n: int = 7,
    min_docs: int = 2,
    portable: bool = False,
    report_residual: bool = False,
):
    """Cut cross-document duplicated regions OUT of the text, keeping the
    first occurrence — the transform step of Lee et al. 2022 (n-gram
    approximation, doc-granular keep-one): every word position whose
    n-gram occurs in >= ``min_docs`` distinct documents is cut from all
    but the gram's smallest-id document, and the surviving tokens are
    re-joined. Returns one row per input document:
    (id, n_removed_words, clean_text) where ``clean_text`` is the
    whitespace-normalized lowercased token stream minus the removed
    regions (the pipeline-normal form, not the raw input casing).

    Keep-one is enforced on token RANGES, not just marked positions:
    every token covered by an occurrence ``[pos, pos+n)`` of a gram whose
    canonical (smallest-id) document is THIS document is protected from
    cuts — including cuts marked by a different, overlapping gram whose
    canonical doc is elsewhere. Without range protection an overlapping
    gram's cut can destroy the canonical occurrence and a shared region
    can be annihilated corpus-wide (e.g. ``['a b','a a b','a a']`` at
    n=2). With it, the canonical occurrence's n tokens all survive and
    stay adjacent, so every shared gram survives in >= 1 document.

    The protection deliberately relaxes Lee et al.'s strict removal:
    where a locally-canonical gram overlaps a marked span, the overlap's
    tokens stay — residual duplication can remain on corpora with heavily
    interleaved canonical ownership. ``report_residual=True`` adds an
    ``n_residual_words`` column (tokens marked for cut but saved by
    protection) so that relaxation is measurable at scale, e.g.
    ``out.agg(F.sum('n_residual_words'))`` as a pipeline health metric.

    Scale shape: the position pass is the linear span pipeline (explode
    -> two-phase count -> join back, now carrying a canonical flag); the
    cut itself is a per-ROW higher-order filter over the token array
    against the doc's own marked/protected position lists — no window,
    no second shuffle beyond the per-doc position collect. Position
    lists are bounded by doc length.
    """
    pos = _cross_doc_positions_with_canon(
        df, id_col, text_col, n, min_docs, portable
    )
    per_doc = pos.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(
                F.when(~F.col("__canon"), F.col("pos").cast("long"))
            )
        ).alias("__mp"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("__canon"), F.col("pos").cast("long"))
            )
        ).alias("__pp"),
    )
    base = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    j = base.join(per_doc, id_col, "left")
    covered = lambda lst, i: F.exists(lst, lambda p: (p <= i) & (i < p + n))
    kept = F.when(F.col("__mp").isNull(), F.col("__t")).otherwise(
        F.filter(
            F.col("__t"),
            lambda x, i: ~covered(F.col("__mp"), i)
            | covered(F.col("__pp"), i),
        )
    )
    cols = [
        F.col(id_col),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_removed_words"),
        F.concat_ws(" ", kept).alias("clean_text"),
    ]
    if report_residual:
        residual = F.when(F.col("__mp").isNull(), F.lit(0)).otherwise(
            F.size(
                F.filter(
                    F.col("__t"),
                    lambda x, i: covered(F.col("__mp"), i)
                    & covered(F.col("__pp"), i),
                )
            )
        )
        cols.append(residual.cast("long").alias("n_residual_words"))
    return j.select(*cols)


def char_bigrams(col: Column | str) -> Column:
    """All char bigrams (WITH multiplicity) of whitespace-normalized
    lowercased text — zip-of-shifted-slices like ``char_trigrams_padded``;
    texts shorter than 2 chars yield an empty array."""
    c = F.regexp_replace(F.lower(F.trim(_col(col))), "\\s+", " ")
    chars = F.split(c, "")
    length = F.length(c) - 1
    acc = F.zip_with(
        F.slice(chars, 1, length), F.slice(chars, 2, length),
        lambda a, b: F.concat(a, b),
    )
    return F.when(F.length(c) >= 2, acc).otherwise(
        F.array().cast("array<string>")
    )


def charlm_nll_scores(df, id_col: str, text_col: str):
    """Per-document average negative log-likelihood under a char-bigram
    language model trained on the corpus itself — the perplexity-proxy
    quality filter (CCNet/KenLM-style filtering, public method): documents
    whose character statistics diverge from the corpus (boilerplate, code
    dumps, mojibake) score a high ``avg_nll``.

    Model: add-one-smoothed bigram LM. p(b|a) = (C(ab)+1) / (C(a)+V) with
    V = distinct chars in the corpus, so every per-bigram term is
    ln(C(a)+V) - ln(C(ab)+1) — logs of INTEGERS, which reproduce
    bit-identically across engines (the tfidf/zipf precedent). Terms are
    nano-quantized before the per-doc sum so the float total is
    shuffle-order independent. Returns (id, n_bigrams, avg_nll).

    Scale shape: one bigram explode -> (doc, bigram) partial-agg counts;
    the GLOBAL bigram/prefix tables re-aggregate from those counts (no
    second scan) and are alphabet^2-bounded (~2k rows) -> BROADCAST joins;
    one shuffle on the doc key end to end. V (distinct corpus chars) is a
    1-row broadcast INSIDE the plan, not a driver collect — one action
    total, and every derived table hangs off the same (doc, bigram)
    shuffle so AQE exchange reuse evaluates the explode once (round-7: the
    previous driver-scalar V forced a second full scan+shuffle job, the
    bulk of the query's bench gap).
    """
    from datagouvfr_data_pipelines_spark.session import fan_out

    # Round 13: the fan IS keyed on the doc id now. The round-12 NOTE here
    # warned against that because the (doc, bigram) exchange was the plan's
    # only shared materialization point; with doc_counts persisted (below)
    # the sharing concern is gone, and hash(id) partitioning satisfies both
    # the (id, bg) aggregate's and the final per-doc aggregate's clustered
    # distribution — the fan exchange is the plan's ONLY batch shuffle of
    # exploded rows.
    bg = fan_out(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), F.explode(char_bigrams(text_col)).alias("bg")
    )
    # Round 13: persist the (doc, bigram) count table around its four plan
    # branches. Catalyst shares only the narrow fan exchange across
    # branches (exchange reuse), so without the persist the bigram explode
    # + partial aggregation re-ran once per branch (doc_counts,
    # global_counts, prefix_counts, V — 4 Generates / 2 scans in the r13
    # before-plan). The cached table is the LM's sufficient statistic,
    # bounded by sum over docs of distinct bigrams per doc; same persist
    # policy as semantic_dedup(persist_base) / incremental_dedup's bidx.
    doc_counts = (
        bg.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    # (A second persist on global_counts was A/B-measured a wash — three
    # re-aggregation passes over the cached doc_counts cost about what the
    # extra materialization barrier does; kept unpersisted for the simpler
    # cache lifecycle.)
    global_counts = doc_counts.groupBy("bg").agg(F.sum("cnt").alias("c_bg"))
    prefix_counts = (
        global_counts.withColumn("pre", F.substring("bg", 1, 1))
        .groupBy("pre")
        .agg(F.sum("c_bg").alias("c_pre"))
    )
    vv = (
        global_counts.select(F.substring("bg", 1, 1).alias("ch"))
        .union(global_counts.select(F.substring("bg", 2, 1)))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("__v"))
    )
    term = F.floor(
        (
            F.log(F.col("c_pre") + F.col("__v"))
            - F.log(F.col("c_bg") + F.lit(1).cast("long"))
        )
        * F.lit(1e9)
    ).cast("long")
    return (
        doc_counts.join(F.broadcast(global_counts), "bg")
        .withColumn("pre", F.substring("bg", 1, 1))
        .join(F.broadcast(prefix_counts), "pre")
        .crossJoin(F.broadcast(vv))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * term).alias("__q"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            (
                (F.col("__q").cast("double") / 1e9)
                / F.col("n_bigrams").cast("double")
            ).alias("avg_nll"),
        )
    )


HTML_TO_TEXT_STEPS = [
    # script/style subtrees and comments vanish wholesale
    ("(?is)<script\\b[^>]*>.*?</script>", " "),
    ("(?is)<style\\b[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines so downstream line-based
    # filters (line_dedup, per-line quality) see real document structure
    (
        "(?i)<(?:/p|/div|/h[1-6]|/li|/ul|/ol|/tr|/table|/blockquote|"
        "/section|/article|/header|/footer|br|hr)\\b[^>]*/?>",
        "\n",
    ),
    # every remaining tag is inline: a space keeps words apart
    ("(?s)<[^>]+>", " "),
    # the named entities that dominate real pages (decode &amp; LAST so
    # '&amp;lt;' decodes to '&lt;', never to '<')
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&copy;", "\u00a9"),
    ("&reg;", "\u00ae"),
    ("&trade;", "\u2122"),
    ("&mdash;", "\u2014"),
    ("&ndash;", "\u2013"),
    ("&hellip;", "\u2026"),
    ("&lsquo;", "\u2018"),
    ("&rsquo;", "\u2019"),
    ("&ldquo;", "\u201c"),
    ("&rdquo;", "\u201d"),
    ("&amp;", "&"),
    # whitespace discipline: spaces collapse, newlines win over spaces,
    # runs of blank lines collapse to one blank line
    ("[ \\t\\f\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n{3,}", "\n\n"),
    # edge trim (Spark's trim() strips only spaces; this strips all
    # whitespace identically on both engines)
    ("^\\s+|\\s+$", ""),
]


def html_to_text(col: Column | str) -> Column:
    """Plain text from an HTML payload — the first stage of every
    web-crawl corpus pipeline (the CCNet/C4 preprocessing step), as a
    pure JVM regexp chain: drop <script>/<style> subtrees and comments,
    turn block-level boundaries into newlines, strip remaining tags,
    decode the common named entities, collapse whitespace. No UDF, no
    HTML library — the expressions run inside whole-stage codegen.

    ONE step table (``HTML_TO_TEXT_STEPS``) drives both this column and
    the DuckDB replica (``html_to_text_sql``); every pattern is
    RE2-compatible (lazy quantifiers, no backrefs) so the two engines
    produce bit-identical strings — oracle-checked end to end by the
    ``t_html_extract`` catalog query.

    Scope is honest: this is tag REMOVAL plus block structure, not a DOM
    parser — attributes containing a literal '>' inside quotes, CDATA,
    and numeric entities pass through simplified; link-density
    boilerplate pruning composes downstream via ``line_dedup`` /
    ``quality_score`` over the extracted lines.
    """
    c = _col(col)
    for pat, rep in HTML_TO_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_to_text_sql(expr: str) -> str:
    """The DuckDB replica of ``html_to_text`` — the same step table
    folded around ``expr`` as RE2 'g'-flag replaces."""
    out = expr
    for pat, rep in HTML_TO_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def canonicalize_url(col: Column | str) -> Column:
    """URL canonicalization for crawl dedup — the rule set every web
    corpus applies before exact-URL dedup, as pure JVM expressions:

    1. scheme and host lowercased
    2. default port stripped (``:80`` for http, ``:443`` for https)
    3. fragment removed
    4. tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``)
    5. remaining query params sorted bytewise; an emptied query drops
       its ``?``
    6. empty path becomes ``/``

    Deliberately NOT applied (they change identity): www-stripping,
    trailing-slash collapsing, percent-decoding. Scheme-less input
    (relative paths, bare hosts) is returned UNCHANGED — the extract
    regexes all require ``://``, so canonicalizing would collapse
    every such URL to the same ``:///``-prefixed string and falsely
    merge distinct documents in the exact-URL dedup. Every step is a
    RE2-compatible regexp or array op, so a DuckDB oracle replicates the
    canonical string bit-for-bit.
    """
    u = _col(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"),
    )
    sorted_q = F.array_join(F.array_sort(kept), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )
    return F.when(scheme == "", u).otherwise(canonical)


def fix_double_utf8(col: Column | str) -> Column:
    """Repair double-encoded UTF-8 mojibake ("\u00c3\u00a9t\u00c3\u00a9" ->
    "\u00e9t\u00e9") — the ftfy-style fix every web corpus applies after
    HTML extraction.

    The exact inverse transform, not a lookup table: re-encode the
    string's code points as Latin-1 bytes and re-decode those bytes as
    UTF-8. For genuine double-encoded text (original chars in U+00..FF,
    the Latin-1/Windows-bridge case that produces the classic
    \u00c3/\u00c2 marker sequences) this recovers the original
    bit-for-bit. Three gates keep it safe on non-mojibake text: the
    input must contain a marker char (U+00C3 or U+00C2 — every
    double-encoded non-ASCII Latin-1 char starts with one), every char
    must be Latin-1-encodable (otherwise the charset encoder would
    substitute '?'), and the Latin-1 bytes must be VALID UTF-8
    (``is_valid_utf8``, checked BEFORE any decode — Spark 4's
    ``decode`` raises MALFORMED_CHARACTER_CODING on invalid input
    instead of emitting U+FFFD, so a post-hoc U+FFFD scan would itself
    force the failing decode and kill the task on ordinary Latin-1
    text like 'S\u00c3O PAULO' or '\u00c2ge'). ``F.decode`` runs only
    inside the when-branch VALUE, which CaseWhen evaluates lazily
    after the gates pass. Anything failing a gate passes through
    unchanged — never a lossy "repair" and never an exception. All
    JVM built-ins (encode/decode/regexp), zero UDF."""
    c = _col(col)
    latin1_bytes = F.encode(c, "ISO-8859-1")
    has_marker = c.rlike("[\u00c2\u00c3]")
    latin1_only = ~c.rlike("[^\u0000-\u00ff]")
    valid = F.is_valid_utf8(latin1_bytes)
    return F.when(
        has_marker & latin1_only & valid, F.decode(latin1_bytes, "UTF-8")
    ).otherwise(c)


# The 27 printable Windows-1252 characters in the 0x80-0x9F block and the
# C1 code points their bytes shadow — built from the stdlib codec at
# import so the pairing can't drift (the 5 undefined bytes 81/8D/8F/90/9D
# stay Latin-1 C1 controls, the "sloppy cp1252" convention every
# mojibake-repair tool uses).
_CP1252_C1 = ""
_CP1252_UNI = ""
for _b in range(0x80, 0xA0):
    try:
        _u = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:
        continue
    if _u != chr(_b):
        _CP1252_C1 += chr(_b)
        _CP1252_UNI += _u


def fix_latin1_utf8(col: Column | str) -> Column:
    """Repair single-decode mojibake: UTF-8 bytes that were read ONCE as
    Windows-1252/Latin-1 ("\u00e2\u20ac\u2122" -> "'", "\u00c3\u00a9"
    -> "\u00e9") — the other common crawl corruption next to
    ``fix_double_utf8``, and a strict superset of it on Latin-1-only
    input. Reference parity anchor: the chardet fallback cascade in
    ``schema/utils/consolidation.py:905-947`` guards ingest against
    exactly this class; here it is a column-level repair.

    The exact inverse transform: map the 27 printable cp1252 specials
    (\u20ac \u2122 \u2019 ...) back to the C1 code points their bytes
    shadow (``F.translate``), re-encode as Latin-1 bytes — together
    that re-encodes the string as Windows-1252 with Latin-1 fallback,
    which Spark's charset list lacks natively — and re-decode those
    bytes as UTF-8. Three gates keep it safe on healthy text, mirroring
    ``fix_double_utf8``: the input must contain a char whose cp1252
    byte is a UTF-8 LEAD byte (U+00C2-U+00F4 — every mojibake'd
    multi-byte sequence starts with one), every char must be
    cp1252-encodable (Latin-1 range or a special), and the
    reconstructed bytes must be valid UTF-8 (``is_valid_utf8``,
    checked BEFORE the lazily-evaluated ``F.decode`` — Spark 4 decode
    raises on invalid input). Ordinary accented text ('d\u00e9but',
    'S\u00c3O PAULO') fails the validity gate and passes through
    unchanged. All JVM built-ins, zero UDF."""
    c = _col(col)
    cp1252_bytes = F.encode(
        F.translate(c, _CP1252_UNI, _CP1252_C1), "ISO-8859-1"
    )
    has_marker = c.rlike("[\u00c2-\u00f4]")
    cp1252_ok = ~c.rlike("[^\u0000-\u00ff" + _CP1252_UNI + "]")
    valid = F.is_valid_utf8(cp1252_bytes)
    return F.when(
        has_marker & cp1252_ok & valid, F.decode(cp1252_bytes, "UTF-8")
    ).otherwise(c)
