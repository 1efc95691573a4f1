"""Round-11 pins: multi-stream AVI frame selection, md5 split fingerprint,
j18 fan-out plan shape, scalefloor 0.0-vs-None ratio guard."""

from __future__ import annotations

import struct

import pytest


def _chunk(cid: bytes, payload: bytes) -> bytes:
    return (cid + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))


def _lst(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def _strl(fourcc: bytes, width: int, height: int, fps: int,
          n_frames: int) -> bytes:
    strh = (b"vids" + fourcc
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                          n_frames, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, fourcc,
        width * height * 3, 0, 0, 0, 0,
    )
    return _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))


def test_avi_multi_stream_keeps_only_mjpg_stream_frames():
    """A two-video-stream AVI (stream 0 = MJPG, stream 1 = another codec
    whose frames ALSO start with FFD8) must time its duration and frame
    lookup on the MJPG stream's own '00dc' chunks only — matching on the
    JPEG signature alone would interleave stream 1's frames into the
    timeline and double the duration."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        make_banded_test_rows, parse_avi_mjpeg,
    )

    w, h, fps = 72, 64, 2  # 500 ms per frame
    rows = [make_banded_test_rows(s) for s in range(3)]
    jpegs = [encode_jpeg_baseline(w, h, r, quality=95) for r in rows]
    mspf_us = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII", mspf_us, 0, 0, 0, len(jpegs), 0, 2, 0, w, h
    ) + b"\x00" * 16
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih)
                + _strl(b"MJPG", w, h, fps, len(jpegs))
                + _strl(b"XVID", w, h, fps, len(jpegs)))
    # interleave: 00dc real JPEG, then 01dc fake frame that also starts
    # with the JPEG SOI marker (the trap the stream-id filter must dodge)
    movi_payload = b"".join(
        _chunk(b"00dc", jpegs[k]) + _chunk(b"01dc", b"\xff\xd8" + b"x" * 40)
        for k in range(len(jpegs))
    )
    body = b"AVI " + hdrl + _lst(b"movi", movi_payload)
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    parsed = parse_avi_mjpeg(avi)
    assert parsed is not None
    dur, frame_at, status = parsed
    assert (dur, status) == (1500, "decoded:mjpeg-avi")
    for k in range(3):
        dec = decode_jpeg_rgb24(frame_at(k * 500))
        assert dec is not None and dec[2] == rows[k], k

    # MJPG as the SECOND stream: frames live in '01dc', decoys in '00dc'
    hdrl2 = _lst(b"hdrl", _chunk(b"avih", avih)
                 + _strl(b"XVID", w, h, fps, len(jpegs))
                 + _strl(b"MJPG", w, h, fps, len(jpegs)))
    movi2 = b"".join(
        _chunk(b"00dc", b"\xff\xd8" + b"y" * 40) + _chunk(b"01dc", jpegs[k])
        for k in range(len(jpegs))
    )
    body2 = b"AVI " + hdrl2 + _lst(b"movi", movi2)
    parsed2 = parse_avi_mjpeg(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    assert parsed2 is not None
    dur2, frame_at2, _ = parsed2
    assert dur2 == 1500
    assert decode_jpeg_rgb24(frame_at2(0))[2] == rows[0]


def test_fingerprint_md5_matches_duckdb_twin(spark):
    """functions/text.py:fingerprint_md5 must equal DuckDB's
    CAST(('0x' || substr(md5(c),1,15)) AS BIGINT) value-for-value —
    this is the assembly split/sample key, so any divergence silently
    reassigns train/val/test membership."""
    import duckdb

    import pyspark.sql.functions as F
    from datagouvfr_data_pipelines_spark.functions.text import fingerprint_md5

    vals = ["", "a", "héllo wörld", "x" * 5000, "line1\nline2", None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, text string")
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", fingerprint_md5("text").alias("fp")).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[i] == want, (i, v, got[i], want)
        if v is not None:
            assert got[i] >= 0


def test_j18_fan_out_plan_shape(spark):
    """j18's scan-side fan_out must surface as an explicit repartition on
    l_orderkey that the basket groupBy reuses — exactly one exchange
    between scan and basket aggregation, none of it at the session's
    low-partition floor."""
    from datagouvfr_data_pipelines_spark import plans

    df = plans.queries()["j18_brand_affinity"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    # the explicit repartition must be the ONLY orderkey exchange: the
    # groupBy reuses it rather than adding an ENSURE_REQUIREMENTS one
    orderkey_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(l_orderkey" in ln
    ]
    assert len(orderkey_exchanges) == 1, orderkey_exchanges
    assert "REPARTITION_BY_NUM" in orderkey_exchanges[0]


def test_scalefloor_ratio_distinguishes_zero_from_none():
    """scripts/bench_scalefloor.py ratio classification: a 0.0 DuckDB
    median is a measured (fast) value, not a skip — only None means
    'oracle infeasible at this point'."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bsf", "scripts/bench_scalefloor.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.ratio_for(1.0, 0.0) == float("inf")
    assert m.ratio_for(1.0, None) is None
    assert m.ratio_for(1.0, 0.5) == 2.0
