"""Python UDTF lateral fan-out (functions/udtfs.py) and Observation-based
inline metrics (quality.py:observe_quality)."""

from __future__ import annotations


def test_split_sentences_udtf_lateral(spark):
    from datagouvfr_data_pipelines_spark.functions.udtfs import (
        split_sentences_df,
    )

    df = spark.createDataFrame(
        [
            (1, "Dr. Smith arrived. He sat down! Was it late?"),
            (2, "One sentence only"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = split_sentences_df(df, "text", "doc_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["idx"], r["sentence"]))
    assert [s for _, s in sorted(by_doc[1])] == [
        "Dr. Smith arrived.",  # abbreviation did not split
        "He sat down!",
        "Was it late?",
    ]
    assert by_doc[2] == [(0, "One sentence only")]
    assert 3 not in by_doc  # null input emits nothing


def test_split_sentences_sql_lateral(spark):
    from datagouvfr_data_pipelines_spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT s.sentence FROM VALUES ('A b. C d.') AS t(x), "
        "LATERAL split_sentences(t.x) s"
    ).collect()
    assert [r["sentence"] for r in rows] == ["A b.", "C d."]


def test_observe_quality_piggybacks_on_action(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.quality import observe_quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)],
        "id long, price double",
    )
    observed, obs = observe_quality(
        df,
        {"positive_price": F.col("price") > 0, "has_price": F.col("price").isNotNull()},
    )
    # the caller's own action drives the metrics — no extra scan
    kept = observed.where(F.col("id") <= 4).count()
    assert kept == 4
    m = obs.get
    assert m["n_rows"] == 4
    assert m["bad_positive_price"] == 2  # -5.0 and NULL (fail-closed)
    assert m["bad_has_price"] == 1


def test_schema_diff_and_contract_gate(spark):
    import pytest

    from datagouvfr_data_pipelines_spark.quality import (
        DataQualityError,
        assert_schema_contract,
        schema_diff,
    )

    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    clean = "a INT, b STRING, c DOUBLE"
    assert schema_diff(df, clean) == {
        "missing": [], "extra": [], "type_changed": [],
    }
    assert assert_schema_contract(df, clean) is df

    drifted = "a BIGINT, b STRING, d DATE"
    diff = schema_diff(df, drifted)
    assert diff["missing"] == ["d"]
    assert diff["extra"] == ["c"]
    assert diff["type_changed"] == [("a", "bigint", "int")]
    with pytest.raises(DataQualityError, match="schema contract violated"):
        assert_schema_contract(df, drifted)
