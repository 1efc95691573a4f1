"""Repetition-ratio + PII-redaction operators (training-data curation tier).

The catalog oracle checks these against DuckDB on the synthetic corpus
(which contains no real PII); the fixtures here pin the behavior on text
that actually contains emails/IPs/phones and on hand-computed repetition.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.text import (
    pii_counts,
    redact_pii,
    repetition_stats,
)


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # "a a a b": top word a=3/4; dup = 3/4; bigrams: "a a"x2,"a b" -> 2/3
            (1, "a a a b"),
            # all distinct: top 1/4, dup 0, bigrams all distinct 1/3
            (2, "w x y z"),
            # single token: no bigrams -> top_bigram_frac 0.0
            (3, "solo"),
            # empty -> excluded entirely
            (4, "   "),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].top_word_frac == 3 / 4
    assert rows[1].dup_word_frac == 3 / 4
    assert rows[1].top_bigram_frac == 2 / 3
    assert rows[2].top_word_frac == 1 / 4
    assert rows[2].dup_word_frac == 0.0
    assert rows[2].top_bigram_frac == 1 / 3
    assert rows[3].top_word_frac == 1.0
    assert rows[3].top_bigram_frac == 0.0


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "contact jean.dupont@example.fr or admin@data.gouv.fr, "
                "server 192.168.0.1, tel +33 06 12 34 56 78",
            ),
            (2, "no pii here at all"),
            # an IP must not survive inside an already-redacted email's place,
            # and a bare IP is typed as <IP>, not <PHONE>
            (3, "10.0.0.255 and x@y.org"),
        ],
        ["doc_id", "text"],
    )
    n_email, n_ip, n_phone = pii_counts("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("clean"),
            n_email.alias("ne"),
            n_ip.alias("ni"),
            n_phone.alias("np"),
        ).collect()
    }
    assert out[1].ne == 2 and out[1].ni == 1 and out[1].np == 1
    assert "<EMAIL>" in out[1].clean and "<IP>" in out[1].clean
    assert "<PHONE>" in out[1].clean
    assert "jean.dupont" not in out[1].clean and "192.168" not in out[1].clean
    assert out[2].clean == "no pii here at all"
    assert (out[2].ne, out[2].ni, out[2].np) == (0, 0, 0)
    assert out[3].clean == "<IP> and <EMAIL>"
    assert (out[3].ne, out[3].ni, out[3].np) == (1, 1, 0)


def test_token_entropy_known_values_and_partition_invariance(spark):
    from datagouvfr_data_pipelines_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # one symbol -> 0 bits
            (2, "a a b b"),            # two equiprobable -> 1 bit
            (3, "a b c d"),            # four equiprobable -> 2 bits
            (4, "a a a b"),            # H = 2 - 0.75*log2(3) ~ 0.811278
            (5, "   "),                # zero tokens -> excluded
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.token_entropy)
        for r in token_entropy(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert got[3] == (4, 2.0)
    assert got[4] == (4, 0.811278)
    assert 5 not in got
    # nano-quantized sum: identical under any partitioning
    again = {
        r.doc_id: (r.n_tokens, r.token_entropy)
        for r in token_entropy(df.repartition(11), "doc_id", "text").collect()
    }
    assert got == again
