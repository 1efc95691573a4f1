"""Round-12 pinning tests: the ADVICE fixes (GIF cumulative frame
budget, miniproto packed fixed-width decode, strict-JSON scalefloor
ratios) and the optimization-round invariants."""

from __future__ import annotations

import json
import struct
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# ------------------------------------------------ GIF cumulative budget


def _tiny_frame_gif(screen_w: int, screen_h: int, n_frames: int) -> bytes:
    """Hand-built GIF89a: a huge logical screen, a global 2-color
    palette, and ``n_frames`` 1x1 frames — the adversarial shape from
    ADVICE (hundreds of GB of canvas snapshots from ~KBs of input)."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", screen_w, screen_h)
    out += bytes([0x80, 0, 0])  # GCT present, 2 colors
    out += bytes([0, 0, 0, 255, 255, 255])
    for _ in range(n_frames):
        # GCE with 10cs delay
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
        # 1 pixel, min code size 2: clear(4), index 0, end(5)
        out += bytes([2])  # LZW minimum code size
        from datagouvfr_data_pipelines_spark.functions.gif_codec import (
            gif_lzw_encode,
        )

        lzw = gif_lzw_encode(2, b"\x00")
        out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_cumulative_frame_budget_bounds_memory():
    """A crafted GIF with a 4000x4000 screen (16 MP/frame snapshot) and
    many 1x1 frames must stop at MAX_GIF_PIXELS // (w*h) retained frames
    (partial decode), never allocate one canvas snapshot per frame."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        MAX_GIF_PIXELS,
        decode_gif_frames,
    )

    w, h = 4000, 4000
    budget = MAX_GIF_PIXELS // (w * h)
    data = _tiny_frame_gif(w, h, budget + 3)
    out = decode_gif_frames(data)
    assert out is not None
    dw, dh, frames = out
    assert (dw, dh) == (w, h)
    assert len(frames) == budget
    # total retained snapshot pixels stay within the documented ceiling
    assert dw * dh * len(frames) <= MAX_GIF_PIXELS


def test_gif_small_animation_unaffected_by_budget():
    """Normal-size animations decode every frame (budget >> frames)."""
    from datagouvfr_data_pipelines_spark.functions.gif_codec import (
        decode_gif_frames,
    )

    data = _tiny_frame_gif(4, 4, 5)
    out = decode_gif_frames(data)
    assert out is not None
    assert len(out[2]) == 5


# -------------------------------------- miniproto packed fixed decoding


def _miniproto_wire():
    from datagouvfr_data_pipelines_spark.vendor import ensure_protobuf

    ensure_protobuf()
    try:
        from google.protobuf import wire  # type: ignore[attr-defined]
    except ImportError:
        pytest.skip("real protobuf installed — vendored runtime dormant")
    return wire


def test_miniproto_decodes_packed_doubles_and_fixed32():
    """proto3 packs repeated float/double/fixed* by default; the runtime
    must decode them (ADVICE: they previously hit the wire-type-mismatch
    skip and were silently dropped)."""
    w = _miniproto_wire()

    desc = w.MsgDesc("M", "test.M")
    desc.add_field(w.FieldDesc("ds", 1, w.T_DOUBLE, True, None))
    desc.add_field(w.FieldDesc("fs", 2, w.T_FIXED32, True, None))

    cls = type("M", (w.Message,), {"DESCRIPTOR": desc})
    desc.concrete = cls

    payload = bytearray()
    w.encode_varint(payload, (1 << 3) | 2)  # field 1, LEN
    doubles = struct.pack("<3d", 1.5, -2.25, 1e300)
    w.encode_varint(payload, len(doubles))
    payload += doubles
    w.encode_varint(payload, (2 << 3) | 2)  # field 2, LEN
    fixed = struct.pack("<2I", 7, 4_000_000_000)
    w.encode_varint(payload, len(fixed))
    payload += fixed

    m = cls()
    m.ParseFromString(bytes(payload))
    assert list(m.ds) == [1.5, -2.25, 1e300]
    assert list(m.fs) == [7, 4_000_000_000]


def test_miniproto_rejects_malformed_packed_fixed():
    """A packed fixed-width payload whose length is not a multiple of
    the element width must fail loudly, not silently truncate."""
    w = _miniproto_wire()

    desc = w.MsgDesc("M2", "test.M2")
    desc.add_field(w.FieldDesc("ds", 1, w.T_DOUBLE, True, None))
    cls = type("M2", (w.Message,), {"DESCRIPTOR": desc})
    desc.concrete = cls

    payload = bytearray()
    w.encode_varint(payload, (1 << 3) | 2)
    w.encode_varint(payload, 7)  # 7 bytes: not a multiple of 8
    payload += b"\x00" * 7
    with pytest.raises(w.DecodeError):
        cls().ParseFromString(bytes(payload))


# ------------------------------------------- scalefloor strict-JSON out


def test_scalefloor_jsonsafe_serializes_inf_strictly():
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from bench_scalefloor import jsonsafe, ratio_for

    assert ratio_for(1.0, None) is None
    assert ratio_for(1.0, 0.0) == float("inf")
    blob = json.dumps(jsonsafe({"ratio": {"q": ratio_for(1.0, 0.0)}}))
    # strict parsers accept it, and the marker survives round-trip
    assert json.loads(blob) == {"ratio": {"q": "inf"}}


# ---------------------------------- wave-2 exact-tier restructure pins


def test_exact_tier_sha_groups_and_null_text(spark):
    """Wave-2 pins: the shared-sha-aggregate exact tier must (a) keep
    only the min id of a 3-doc duplicate group (the other two dropped as
    exact_batch), and (b) never exact-match NULL-text docs — their sha
    is NULL and the old join-on-sha form dropped them via null-unsafe
    equality, so the aggregate form excludes them explicitly.

    NULL-text docs still meet in the NEAR tier: word_shingles yields
    [''] for empty/NULL text, so every zero-content doc carries the same
    one-shingle signature and they near-match each other (bounded by the
    bucket cap). That is long-standing behavior, identical before and
    after the wave-2 restructures (verified against the pre-wave-2 tree)
    — this test pins it so a future change is a conscious one."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("body", StringType()),
        ]
    )
    corpus = spark.createDataFrame([(1, "totally unrelated corpus text")], schema)
    idx = build_dedup_index(corpus, "doc_id", "body").persist()
    batch = spark.createDataFrame(
        [
            (20, "same exact content here"),
            (21, "same exact content here"),
            (22, "same exact content here"),  # 3-doc sha group: keep 20
            (23, None),  # NULL text -> NULL sha
            (24, None),  # second NULL: must NOT pair with 23
        ],
        schema,
    )
    res = incremental_dedup(batch, idx, "doc_id", "body", threshold=0.8)
    ledger = {r["doc"]: r["reason"] for r in res.ledger.collect()}
    assert ledger == {
        21: "exact_batch",
        22: "exact_batch",
        24: "near_batch",  # the empty-doc near-pair (23, 24); 23 is kept
    }
    survivors = sorted(r["doc_id"] for r in res.survivors.collect())
    assert survivors == [20, 23]
    idx.unpersist()


def test_seq_dots_block_bit_exact_vs_jvm_fold_order():
    """_seq_dots_block must reproduce the JVM left-to-right fold's IEEE op
    order exactly: S[i,j] = ((0 + a0*b0) + a1*b1) + ... in float64. Checked
    bitwise against a scalar Python loop (which is that exact order) on
    float32-quantized random vectors — the embeddings table's element type."""
    import struct

    import numpy as np

    from datagouvfr_data_pipelines_spark.functions.similarity import (
        _seq_dots_block,
    )

    rng = np.random.RandomState(7)
    A = rng.randn(13, 64).astype(np.float32).astype(np.float64)
    B = rng.randn(9, 64).astype(np.float32).astype(np.float64)
    S = _seq_dots_block(A, B)
    for i in range(A.shape[0]):
        for j in range(B.shape[0]):
            acc = 0.0
            for t in range(64):
                acc = acc + float(A[i, t]) * float(B[j, t])
            assert struct.pack("<d", acc) == struct.pack("<d", S[i, j]), (i, j)


def test_pair_kernel_block_invariance(spark, monkeypatch):
    """The pair kernel's memory blocking must not change results: a cell
    bigger than one block (forced via a 1-byte block budget -> 64-row
    blocks) yields the same statuses as the single-block run."""
    import numpy as np

    import datagouvfr_data_pipelines_spark.functions.similarity as S
    from datagouvfr_data_pipelines_spark.functions.similarity import (
        semantic_dedup,
    )

    rng = np.random.RandomState(3)
    rows = [
        (i, (rng.randn(8) * 0.05 + np.array([1.0] + [0.0] * 7)).astype("float32").tolist())
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0] + [0.0] * 7, [-1.0] + [0.0] * 7]

    def run():
        return {
            r.vec_id: (r.cell, r.c_sim, r.status)
            for r in semantic_dedup(
                df, "vec_id", "embedding", cents, threshold=0.97
            ).collect()
        }

    base = run()
    monkeypatch.setattr(S, "_PAIR_BLOCK_BYTES", 1)
    blocked = run()
    assert blocked == base
    assert any(s == "dropped" for _, _, s in base.values())  # non-trivial
