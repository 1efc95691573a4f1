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


# ---------------------------------------------------------------- GIF codec


def test_gif_lzw_spec_vector():
    """Hand-computed LZW stream (2x2 indices [0,1,1,0], min code size 2,
    code width bump 3->4 exactly when the decoder table hits 8 entries):
    pins both the bit order and the 'late' width-change rule against an
    independently derived byte sequence, not a round-trip."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        gif_lzw_decode, gif_lzw_encode,
    )

    assert gif_lzw_decode(2, bytes([0x44, 0x02, 0x05]), 4) == bytes([0, 1, 1, 0])
    assert gif_lzw_encode(2, bytes([0, 1, 1, 0])) == bytes([0x44, 0x02, 0x05])


def test_gif_roundtrip_and_table_growth():
    """Encode/decode round-trip is pixel-exact, including a 200x200
    2-color noise raster that grows the LZW table through every code
    width and past the 4096-entry clear."""
    import random

    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_rgb24, encode_gif_rgb24,
    )

    w, h = 64, 48
    rows = [
        [((x // 8 * 32) % 256, (y // 6 * 32) % 256, ((x // 8 + y // 6) * 16) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    enc = encode_gif_rgb24(w, h, rows)
    assert enc is not None and enc[:6] == b"GIF89a"
    assert decode_gif_rgb24(enc)[2] == rows

    rng = random.Random(7)
    noise = [
        [(0, 0, 0) if rng.random() < 0.5 else (255, 255, 255)
         for _ in range(200)]
        for _ in range(200)
    ]
    enc2 = encode_gif_rgb24(200, 200, noise)
    assert decode_gif_rgb24(enc2)[2] == noise

    # >256 distinct colors is out of the palette format, honestly refused
    truecolor = [[(x, y, (x + y) % 256) for x in range(64)] for y in range(64)]
    assert encode_gif_rgb24(64, 64, truecolor) is None


def test_gif_real_world_fixtures_decode():
    """Independent validation against files written by real encoders:
    every GIF shipped in this container (libxslt docs — GIF87a and
    GIF89a, with and without transparency) must decode to exact header
    dimensions with in-palette pixels."""
    import glob
    import struct as _struct

    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_rgb24,
    )

    paths = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))
    if not paths:
        pytest.skip("no GIF fixtures in this container")
    for p in paths:
        with open(p, "rb") as fh:
            data = fh.read()
        w, h = _struct.unpack("<HH", data[6:10])
        dec = decode_gif_rgb24(data)
        assert dec is not None, p
        assert (dec[0], dec[1]) == (w, h), p
        assert len(dec[2]) == h and len(dec[2][0]) == w, p


def test_gif_interlaced_and_transparent_decode():
    """Interlaced frames deinterlace through the 4-pass row order, and
    GCE-transparent pixels composite onto the background color."""
    import struct as _struct

    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        _interlace_rows, decode_gif_rgb24, gif_lzw_encode,
    )

    w, h = 8, 10
    # palette: 0=red (background), 1=green, 2=blue (transparent)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])
    rows_idx = [[1 if (x + y) % 3 else 2 for x in range(w)] for y in range(h)]
    order = _interlace_rows(h)
    assert sorted(order) == list(range(h)) and order[:3] == [0, 8, 4]
    stream = bytes(
        px for y in order for px in rows_idx[y]
    )
    lzw = gif_lzw_encode(2, stream)
    gif = bytearray()
    gif += b"GIF89a" + _struct.pack("<HH", w, h)
    gif += bytes([0x81, 0, 0]) + pal          # GCT of 4, bg index 0
    gif += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 2, 0])  # GCE: transparent=2
    gif += b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h)
    gif += bytes([0x40])                       # interlaced, no LCT
    gif += bytes([2])                          # min code size
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"

    dec = decode_gif_rgb24(bytes(gif))
    assert dec is not None and (dec[0], dec[1]) == (w, h)
    for y in range(h):
        for x in range(w):
            want = (0, 255, 0) if (x + y) % 3 else (255, 0, 0)  # transp->bg
            assert dec[2][y][x] == want, (x, y)


def test_gif_corrupt_and_truncated_return_none():
    """Malformed untrusted bytes must return None, never raise — an
    exception in the Arrow worker kills the task, not one image."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_rgb24, encode_gif_rgb24,
    )

    good = encode_gif_rgb24(16, 16, [[(0, 0, 0)] * 16] * 16)
    assert decode_gif_rgb24(None) is None
    assert decode_gif_rgb24(b"") is None
    assert decode_gif_rgb24(b"GIF89a") is None
    assert decode_gif_rgb24(good[:20]) is None
    assert decode_gif_rgb24(good[:len(good) // 2]) is None
    corrupted = bytearray(good)
    corrupted[-10] ^= 0xFF
    decode_gif_rgb24(bytes(corrupted))  # any result, just no raise
    # absurd claimed dimensions must not allocate
    huge = bytearray(good)
    huge[6:10] = (65535).to_bytes(2, "little") * 2
    assert decode_gif_rgb24(bytes(huge)) is None


def test_gif_dhash_and_resize_integration():
    """dhash64_py hashes GIF payloads into the same hash space as the
    raw raster (lossless decode -> identical dhash), and resize_images
    takes the real-resize branch with format preserved."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_rgb24, encode_gif_rgb24, resize_gif_nearest,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        dhash64_py, make_banded_test_rows, make_bmp,
    )

    rows = make_banded_test_rows(3)
    gif = encode_gif_rgb24(72, 64, rows)
    bmp = make_bmp(72, 64, rows)
    assert dhash64_py(gif) == dhash64_py(bmp)

    small = resize_gif_nearest(gif, 24)
    assert small is not None and small[:6] == b"GIF89a"
    dw, dh, _ = decode_gif_rgb24(small)
    assert max(dw, dh) == 24
    assert resize_gif_nearest(gif, 100) == gif  # already fits: unchanged


# ---------------------------------------------------- miniproto runtime


def _miniproto():
    from datagouvfr_data_pipelines_spark.vendor import ensure_protobuf

    mode = ensure_protobuf()
    try:
        # the vendored runtime is identified by its wire module — the
        # ensure_protobuf return value alone can't distinguish "real"
        # from "mini activated earlier in this process"
        from google.protobuf import wire  # type: ignore[attr-defined]
    except ImportError:
        pytest.skip(
            "real protobuf installed — the vendored runtime is dormant "
            "(these tests pin the fallback only)"
        )
    return mode, wire


def test_miniproto_varint_and_zigzag():
    """Wire primitives against spec-known encodings: varint 300 is
    0xAC 0x02 (protobuf.dev's worked example); negative int64 is 10
    bytes of two's complement; zigzag maps -1 -> 1, 1 -> 2."""
    _, w = _miniproto()

    out = bytearray()
    w.encode_varint(out, 300)
    assert bytes(out) == b"\xac\x02"
    assert w.decode_varint(b"\xac\x02", 0) == (300, 2)

    out = bytearray()
    w.encode_varint(out, -2)
    assert len(out) == 10
    v, _ = w.decode_varint(bytes(out), 0)
    assert w._to_signed64(v) == -2

    assert w._zigzag_encode(-1) == 1
    assert w._zigzag_encode(1) == 2
    assert w._zigzag_decode(w._zigzag_encode(-123456789)) == -123456789


def test_miniproto_loads_pyspark_gencode_and_roundtrips():
    """The vendored runtime must load pyspark's REAL generated
    StateMessage_pb2 (descriptor-pool + builder path) and round-trip the
    exact message shapes the stateful clients construct. The end-to-end
    JVM oracle is test_streaming.py::test_transform_with_state_running_
    totals; this pins the Python-side reflection layer in isolation."""
    mode, _ = _miniproto()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.version == 2
    assert back.statefulProcessorCall.setHandleState.state == sm.INITIALIZED

    # repeated bytes + bool (the list-get response shape)
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bc", b""], requireNextFetch=True
    )
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(resp.SerializeToString())
    assert list(back2.value) == [b"a", b"bc", b""]
    assert back2.requireNextFetch is True
    # unset fields read as typed defaults
    assert back2.errorMessage == ""
    fresh = sm.StateResponse()
    assert fresh.statusCode == 0 and fresh.value == b""


def test_miniproto_unknown_fields_and_strings():
    """Forward compatibility: unknown field numbers are skipped, UTF-8
    strings round-trip, and parsing is re-entrant (ParseFromString
    resets prior state)."""
    mode, w = _miniproto()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.ParseStringSchema(schema="key string, café double")
    data = msg.SerializeToString()
    # splice an unknown field 15 (varint 7) in front
    spliced = bytes([15 << 3 | 0, 7]) + data
    back = sm.ParseStringSchema()
    back.ParseFromString(spliced)
    assert back.schema == "key string, café double"
    back.ParseFromString(data)
    assert back.schema == "key string, café double"


# --------------------------------------- animated GIF + MP4 container


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _make_test_mp4(duration_ms=2500, timescale=1000, w=320, h=240,
                   codec=b"avc1") -> bytes:
    mvhd = (bytes([0]) + b"\x00" * 3 + b"\x00" * 8
            + struct.pack(">II", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80)
    tkhd = (bytes([0]) + b"\x00" * 3 + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16))
    entry = struct.pack(">I", 16) + codec + b"\x00" * 8
    stsd = bytes([0]) + b"\x00" * 3 + struct.pack(">I", 1) + entry
    stbl = _box(b"stsd", stsd)
    minf = _box(b"stbl", stbl)
    mdia = _box(b"minf", minf)
    trak = _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


def test_mp4_container_metadata_parse():
    """parse_mp4_metadata walks ftyp/moov/mvhd/trak/tkhd/stsd and
    reports real duration (timescale-normalized), track dims, and the
    codec fourcc; garbage and truncation return None."""
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        parse_mp4_metadata,
    )

    mp4 = _make_test_mp4(duration_ms=2500, timescale=90_000, w=320, h=240)
    assert parse_mp4_metadata(mp4) == (2500, 320, 240, "avc1")
    # version-1 mvhd (64-bit duration) and a different codec
    assert parse_mp4_metadata(
        _make_test_mp4(duration_ms=1000, codec=b"hvc1")
    ) == (1000, 320, 240, "hvc1")
    assert parse_mp4_metadata(b"not a video") is None
    assert parse_mp4_metadata(mp4[:30]) is None
    assert parse_mp4_metadata(None) is None


def test_gif_animation_decode_composition():
    """decode_gif_frames honors per-frame delays (0/1 cs render as
    100 ms), composites partial frames onto the running canvas, and
    disposal 2 restores the frame rect to background."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_frames, encode_gif_animation,
    )

    w, h = 10, 8
    red, green, blue = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    anim = encode_gif_animation(
        w, h,
        [([[red] * w for _ in range(h)], 50),
         ([[green] * w for _ in range(h)], 30),
         ([[blue] * w for _ in range(h)], 0)],
    )
    dw, dh, frames = decode_gif_frames(anim)
    assert (dw, dh) == (w, h)
    assert [(ts, dur) for ts, dur, _ in frames] == [
        (0, 500), (500, 300), (800, 100)
    ]
    assert frames[1][2][0][0] == green

    # hand-build: frame 2 is a 2x2 patch at (1,1) over frame 1 (keep),
    # with disposal 2 on frame 2 so frame 3's canvas is restored
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        gif_lzw_encode,
    )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # r g b bg->r
    def img(left, top, fw, fh, idxs, disposal, delay_cs):
        gce = bytes([0x21, 0xF9, 4, disposal << 2]) + struct.pack(
            "<H", delay_cs) + bytes([0, 0])
        desc = b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        lzw = gif_lzw_encode(2, bytes(idxs))
        blocks = b"".join(
            bytes([len(lzw[o:o+255])]) + lzw[o:o+255]
            for o in range(0, len(lzw), 255))
        return gce + desc + bytes([2]) + blocks + b"\x00"

    gif = (b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x81, 0, 0]) + pal
           + img(0, 0, 4, 4, [0] * 16, 0, 10)          # full red
           + img(1, 1, 2, 2, [1] * 4, 2, 10)           # green patch, disp 2
           + img(0, 0, 1, 1, [2], 0, 10)               # blue pixel
           + b"\x3b")
    _, _, fr = decode_gif_frames(gif)
    assert len(fr) == 3
    assert fr[1][2][1][1] == (0, 255, 0)      # patch composited over red
    assert fr[1][2][0][0] == (255, 0, 0)      # outside patch unchanged
    assert fr[2][2][1][1] == (255, 0, 0)      # disposal 2 restored to bg
    assert fr[2][2][0][0] == (0, 0, 255)      # frame 3's own pixel


def test_sample_frames_gif_and_mp4_paths(spark):
    """sample_frames: animated GIFs sample REAL composited frames (PNG
    re-encode, decodable downstream), MP4 payloads get a REAL duration
    grid with the codec in the status, and unknown bytes keep the
    stand-in."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        encode_gif_animation,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        decode_png_rgb24, sample_frames,
    )

    w, h = 8, 6
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    anim = encode_gif_animation(
        w, h, [([[c] * w for _ in range(h)], 50) for c in colors]
    )  # 3 frames x 500 ms = 1500 ms
    mp4 = _make_test_mp4(duration_ms=1200)
    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(mp4)), (3, bytearray(b"???"))],
        "media_id long, content binary",
    )
    out = sample_frames(df, "media_id", "content", every_ms=500).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    gif_rows = sorted(by_id[1], key=lambda r: r["ts_ms"])
    assert [r["ts_ms"] for r in gif_rows] == [0, 500, 1000]
    assert gif_rows[0]["decode_status"] == "decoded:gif-anim"
    for r, want in zip(gif_rows, colors):
        dec = decode_png_rgb24(bytes(r["frame"]))
        assert dec is not None and dec[2][0][0] == want
    mp4_rows = by_id[2]
    assert {r["decode_status"] for r in mp4_rows} == {"container:mp4-avc1"}
    assert [r["ts_ms"] for r in sorted(mp4_rows, key=lambda x: x["ts_ms"])] \
        == [0, 500, 1000]
    assert by_id[3][0]["decode_status"] == "fake-decoded"
