"""quality assertions, XML reader, Excel gating, orchestration DAG."""

from __future__ import annotations

import datetime as dt

import pytest

from datagouvfr_data_pipelines_spark.io.excel import read_excel
from datagouvfr_data_pipelines_spark.io.xml_reader import read_xml
from datagouvfr_data_pipelines_spark.orchestration.dag import Job, JobDag
from datagouvfr_data_pipelines_spark.quality import (
    DataQualityError,
    assert_columns,
    assert_fresh,
    assert_non_empty,
    assert_row_conservation,
    assert_unique,
)

PDV_XML = """<?xml version="1.0" encoding="UTF-8"?>
<pdv_liste>
  <pdv id="1000001" latitude="4620114" longitude="519791" cp="01000">
    <adresse>596 AVENUE DE TREVOUX</adresse>
    <prix nom="Gazole" id="1" maj="2024-01-05" valeur="1.799"/>
    <prix nom="SP95" id="2" maj="2024-01-05" valeur="1.899"/>
  </pdv>
  <pdv id="1000002" latitude="4621842" longitude="522767" cp="01000">
    <adresse>16 Avenue de Marboz</adresse>
    <prix nom="Gazole" id="1" maj="2024-01-06" valeur="1.749"/>
  </pdv>
</pdv_liste>
"""


def test_read_xml_parent_rows(spark, tmp_path):
    f = tmp_path / "pdv.xml"
    f.write_text(PDV_XML)
    df = read_xml(
        spark, str(f), "pdv",
        {"pdv_id": "@id", "cp": "@cp", "adresse": "adresse"},
    )
    rows = {r["pdv_id"]: r for r in df.collect()}
    assert set(rows) == {"1000001", "1000002"}
    assert rows["1000001"]["adresse"] == "596 AVENUE DE TREVOUX"
    assert rows["1000002"]["cp"] == "01000"


def test_read_xml_child_explode(spark, tmp_path):
    """UDTF shape: one <pdv> fans out into one row per <prix>."""
    f = tmp_path / "pdv.xml"
    f.write_text(PDV_XML)
    df = read_xml(
        spark, str(f), "pdv",
        {"pdv_id": "@id"},
        child_tag="prix",
        child_fields={"carburant": "@nom", "valeur": "@valeur"},
    )
    rows = sorted((r["pdv_id"], r["carburant"], r["valeur"]) for r in df.collect())
    assert rows == [
        ("1000001", "Gazole", "1.799"),
        ("1000001", "SP95", "1.899"),
        ("1000002", "Gazole", "1.749"),
    ]


def test_excel_roundtrip_stdlib_codec(spark, tmp_path):
    """S4/S21 executable end-to-end WITHOUT openpyxl: multi-sheet write via
    the stdlib OOXML codec, read back via read_excel (index and name
    addressing), including escaping and None handling."""
    from datagouvfr_data_pipelines_spark.io.excel import write_excel_sheets

    kpi = spark.createDataFrame(
        [("ara", 12, "a&b <ok>"), ("idf", 34, None)],
        "region string, nb int, note string",
    )
    totals = spark.createDataFrame([("all", 46)], "scope string, nb int")
    path = str(tmp_path / "kpis.xlsx")
    write_excel_sheets({"regions": kpi, "totals": totals}, path)

    back = read_excel(spark, path, sheet_name="regions")
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [("ara", "12", "a&b <ok>"), ("idf", "34", "")]
    second = read_excel(spark, path, sheet_name=1)
    assert [tuple(r) for r in second.collect()] == [("all", "46")]
    with pytest.raises(KeyError, match="no sheet named"):
        read_excel(spark, path, sheet_name="missing")


def test_excel_distributed_default_parser_stdlib(spark, tmp_path):
    """The distributed scan's DEFAULT parser works in this container via
    the stdlib codec (no openpyxl gate left)."""
    from datagouvfr_data_pipelines_spark.io.excel import (
        read_excel_distributed,
        write_excel_sheets,
    )

    a = spark.createDataFrame([("s1", "1.80"), ("s2", "1.90")], "station string, price string")
    b = spark.createDataFrame([("s3", "1.70")], "station string, price string")
    write_excel_sheets({"data": a}, str(tmp_path / "a.xlsx"))
    write_excel_sheets({"data": b}, str(tmp_path / "b.xlsx"))

    df = read_excel_distributed(
        spark, str(tmp_path) + "/*.xlsx", "station string, price string"
    )
    rows = sorted((r["station"], r["price"]) for r in df.collect())
    assert rows == [("s1", "1.80"), ("s2", "1.90"), ("s3", "1.70")]
    assert all(r["source_file"].endswith(".xlsx") for r in df.collect())


def test_read_excel_distributed_plumbing(spark, tmp_path):
    """Distributed Excel scan with an injected parser: binaryFile ->
    mapInPandas -> typed rows + source_file lineage. The default openpyxl
    parser stays gated (no lib in the container); the fake parses a
    CSV-bytes 'workbook' so the executor-side path is fully exercised."""
    import pandas as pd

    from datagouvfr_data_pipelines_spark.io.excel import read_excel_distributed

    (tmp_path / "a.xlsx").write_bytes(b"station,price\ns1,1.80\ns2,1.90\n")
    (tmp_path / "b.xlsx").write_bytes(b"station,price\ns3,1.70\n")

    def fake_parser(content: bytes, sheet):
        import io as _io

        return pd.read_csv(_io.BytesIO(content), dtype=str)

    df = read_excel_distributed(
        spark, str(tmp_path) + "/*.xlsx", "station string, price string",
        parser=fake_parser,
    )
    rows = sorted((r["station"], r["price"]) for r in df.collect())
    assert rows == [("s1", "1.80"), ("s2", "1.90"), ("s3", "1.70")]
    srcs = {r["source_file"] for r in df.collect()}
    assert len(srcs) == 2 and all(s.endswith(".xlsx") for s in srcs)


def test_quality_assertions(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (2, "c")], "k int, v string")
    with pytest.raises(DataQualityError, match="duplicate keys"):
        assert_unique(df, ["k"])
    assert_unique(df, ["k", "v"])  # composite key is unique
    assert_columns(df, ["k", "v"])
    with pytest.raises(DataQualityError, match="missing required"):
        assert_columns(df, ["k", "nope"])
    assert_row_conservation(3, df)
    with pytest.raises(DataQualityError, match="conservation"):
        assert_row_conservation(10, df)
    assert_non_empty(df)
    with pytest.raises(DataQualityError, match="empty"):
        assert_non_empty(df.where("k > 99"), "filtered")


def test_freshness_guard(spark):
    df = spark.createDataFrame(
        [("2024-01-10 00:00:00",)], "ts string"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts")
    now = dt.datetime(2024, 1, 12)
    assert_fresh(df, "ts", dt.timedelta(days=7), now=now)
    with pytest.raises(DataQualityError, match="stale"):
        assert_fresh(df, "ts", dt.timedelta(days=1), now=now)


def test_job_dag_order_shortcircuit_retry():
    calls = []
    dag = (
        JobDag()
        .add(Job("extract", lambda r: calls.append("extract") or 10))
        .add(
            Job(
                "gate",
                lambda r: calls.append("gate") or r["extract"],
                deps=["extract"],
                short_circuit=lambda r: r["extract"] > 5,
            )
        )
        .add(Job("load", lambda r: calls.append("load") or r["gate"] + 1, deps=["gate"]))
    )
    out = dag.run()
    assert calls == ["extract", "gate", "load"]
    assert out["load"] == 11 and out["__skipped__"] == []

    # short-circuit False skips the job and its dependents
    calls2 = []
    dag2 = (
        JobDag()
        .add(Job("a", lambda r: calls2.append("a") or 1))
        .add(Job("b", lambda r: calls2.append("b"), deps=["a"],
                 short_circuit=lambda r: False))
        .add(Job("c", lambda r: calls2.append("c"), deps=["b"]))
        .add(Job("d", lambda r: calls2.append("d"), deps=["a"]))
    )
    out2 = dag2.run()
    assert calls2 == ["a", "d"]
    assert out2["__skipped__"] == ["b", "c"]

    # retry: fails twice then succeeds
    attempts = {"n": 0}

    def flaky(r):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    out3 = JobDag().add(Job("flaky", flaky, retries=3)).run()
    assert out3["flaky"] == "ok" and attempts["n"] == 3

    # cycles detected
    with pytest.raises(ValueError, match="cycle"):
        JobDag().add(Job("x", lambda r: 1, deps=["y"])).add(
            Job("y", lambda r: 1, deps=["x"])
        ).run()
