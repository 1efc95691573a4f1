"""Python UDTFs (Spark 4 table functions): one input row fans out to many
typed rows through a LATERAL join — the modern form of the reference's
XML child-record explosion (io/xml_reader.py keeps the mapInPandas form
for binary payloads; this module covers the SQL-facing surface).

UDTFs complement the engine's explode-based fan-outs: use a column
``explode`` when the fan-out is expressible as an array expression (it
stays in codegen), and a UDTF when per-row procedural logic must drive
the fan-out (sentence segmentation with abbreviation handling here).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# Abbreviations that end with '.' but do not terminate a sentence.
_ABBREV = {"m.", "mme.", "dr.", "st.", "etc.", "cf.", "e.g.", "i.e.", "vs."}


@udtf(returnType="sentence: string, idx: int, n_chars: int")
class SplitSentences:
    """Sentence segmenter: splits on ./!/? boundaries while holding back
    known abbreviations — procedural lookbehind state that an array
    expression can't express cleanly. Emits (sentence, idx, n_chars)."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        out: list[str] = []
        buf: list[str] = []
        for tok in str(text).split():
            buf.append(tok)
            low = tok.lower()
            if low[-1:] in {".", "!", "?"} and low not in _ABBREV:
                out.append(" ".join(buf))
                buf = []
        if buf:
            out.append(" ".join(buf))
        for i, s in enumerate(out):
            yield s, i, len(s)


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL:
    ``SELECT s.* FROM docs, LATERAL split_sentences(text) s``."""
    spark.udtf.register("split_sentences", SplitSentences)


def split_sentences_df(df, text_col: str, id_col: str):
    """DataFrame-side fan-out: one row per sentence with the source id.
    Uses the SQL LATERAL form (the UDTF join operator), not a Python-side
    loop — Catalyst plans one generator per input partition."""
    spark = df.sparkSession
    register_udtfs(spark)
    df.createOrReplaceTempView("__udtf_src")
    return spark.sql(
        f"SELECT t.{id_col}, s.sentence, s.idx, s.n_chars "
        f"FROM __udtf_src t, LATERAL split_sentences(t.{text_col}) s"
    )


__all__ = ["SplitSentences", "register_udtfs", "split_sentences_df"]
