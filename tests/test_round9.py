"""Round-9 tests: geometry-as-data point-in-polygon (point_in_polygon_col).

The column form must be semantically IDENTICAL to the literal form
(point_in_rings) — same even-odd fill rule, same PNPOLY half-open boundary
convention — while taking the rings from a per-row
array<array<array<double>>> column with constant expression size.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.geo import (
    point_in_polygon_col,
    point_in_rings,
)

# concave "U" shape: even-odd must report the notch as outside
_CONCAVE = [
    [(0.0, 0.0), (6.0, 0.0), (6.0, 5.0), (4.0, 5.0), (4.0, 2.0),
     (2.0, 2.0), (2.0, 5.0), (0.0, 5.0)]
]
# square with a hole
_HOLED = [
    [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0)],
    [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)],
]
# multipolygon: two disjoint outer rings
_MULTI = [
    [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)],
    [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0)],
]


def _rings_lit(rings):
    return F.array(
        *[
            F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in ring])
            for ring in rings
        ]
    )


def _grid(spark, rings, step=0.5, pad=1.0):
    xs = [p[0] for ring in rings for p in ring]
    ys = [p[1] for ring in rings for p in ring]
    pts = []
    x = min(xs) - pad
    while x <= max(xs) + pad:
        y = min(ys) - pad
        while y <= max(ys) + pad:
            pts.append((x, y))
            y += step
        x += step
    return spark.createDataFrame(pts, "x double, y double")


@pytest.mark.parametrize("rings", [_CONCAVE, _HOLED, _MULTI])
def test_point_in_polygon_col_matches_literal(spark, rings):
    """Bit-identical to the literal unrolled form over a vertex-straddling
    half-step grid — INCLUDING points exactly on edges and vertices, so
    the half-open boundary convention is pinned too."""
    df = _grid(spark, rings).select(
        "x",
        "y",
        point_in_rings("x", "y", rings).alias("lit_in"),
        point_in_polygon_col("x", "y", _rings_lit(rings)).alias("col_in"),
    )
    bad = df.where(F.col("lit_in") != F.col("col_in")).collect()
    assert not bad, f"column form diverges from literal form at: {bad[:5]}"


def test_point_in_polygon_col_semantics(spark):
    """Spot semantics: hole excluded, notch of the concave U excluded,
    both lobes of a multipolygon included, boundary points False."""
    cases = [
        # (rings, x, y, expected)
        (_HOLED, 1.0, 1.0, True),    # in outer, outside hole
        (_HOLED, 4.0, 4.0, False),   # inside the hole
        # half-open boundary convention (PNPOLY): left edge in, right out
        (_HOLED, 0.0, 4.0, True),
        (_HOLED, 8.0, 4.0, False),
        (_CONCAVE, 1.0, 1.0, True),  # left arm
        (_CONCAVE, 5.0, 4.0, True),  # right arm
        (_CONCAVE, 3.0, 4.0, False),  # the notch
        (_MULTI, 1.0, 1.0, True),
        (_MULTI, 11.0, 11.0, True),
        (_MULTI, 5.0, 5.0, False),   # between the lobes
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (_, x, y, _) in enumerate(cases)],
        "i long, x double, y double",
    )
    rings_col = F.element_at(
        F.array(*[_rings_lit(r) for r, _, _, _ in cases]),
        (F.col("i") + 1).cast("int"),
    )
    got = {
        r["i"]: r["inside"]
        for r in df.select(
            "i", point_in_polygon_col("x", "y", rings_col).alias("inside")
        ).collect()
    }
    for i, (_, x, y, want) in enumerate(cases):
        assert got[i] == want, f"case {i} ({x},{y}): want {want} got {got[i]}"


def test_point_in_polygon_col_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 0.5, 0.5), (3, None, 0.5)],
        "i long, x double, y double",
    )
    # i=1: real square; i=2: degenerate 2-point "ring" (zero crossings ->
    # outside); i=3: null coordinate -> null result
    sq = _rings_lit([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]])
    deg = _rings_lit([[(0.0, 0.0), (1.0, 1.0)]])
    rings = (
        F.when(F.col("i") == 1, sq)
        .when(F.col("i") == 2, deg)
        .otherwise(sq)
    )
    rows = {
        r["i"]: r["inside"]
        for r in df.select(
            "i", point_in_polygon_col("x", "y", rings).alias("inside")
        ).collect()
    }
    assert rows[1] is True
    assert rows[2] is False
    assert rows[3] is None

    # null rings column -> null result
    nr = df.where(F.col("i") == 1).select(
        point_in_polygon_col(
            "x", "y", F.lit(None).cast("array<array<array<double>>>")
        ).alias("inside")
    ).collect()
    assert nr[0]["inside"] is None


def test_point_in_polygon_col_is_udf_free(spark):
    """The fold must stay JVM-side: no BatchEvalPython / ArrowEvalPython
    node anywhere in the physical plan."""
    df = _grid(spark, _HOLED).select(
        point_in_polygon_col("x", "y", _rings_lit(_HOLED)).alias("inside")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    """The nprobe dial must trade cost for recall monotonically: the
    candidate set at nprobe=m is a subset of the one at m' > m, so
    recall@10 can only go up. Also pins that the anchor's own cell is
    probed first (nprobe=1 recall > 0 — the anchor itself is always a
    top-10 hit of its own query)."""
    from datagouvfr_data_pipelines_spark.plans.text_pipeline2 import (
        sim_ivf_nprobe_sweep,
    )

    rows = {
        r["nprobe"]: r["recall_at_10"]
        for r in sim_ivf_nprobe_sweep(spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 4]
    assert rows[1] > 0.0
    assert rows[1] <= rows[2] <= rows[4] <= 1.0


# --------------------------------------------------------------------------
# Streaming semantic-index compaction (seg=<gen> + _base_seg pointer)
# --------------------------------------------------------------------------

_SEM_CENTS = [[1.0, 0.0], [-1.0, 0.0]]
_SEM_SCHEMA = "vec_id long, embedding array<float>"


def _land(spark, tmp_path, src, rows, name):
    import glob as globmod
    import shutil

    stage = str(tmp_path / "stage")
    spark.createDataFrame(rows, _SEM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = globmod.glob(stage + "/part-*.parquet")[0]
    shutil.move(part, str(src / name))


def _stream_kwargs(tmp_path, tag, **over):
    kw = dict(
        schema=_SEM_SCHEMA,
        id_col="vec_id",
        vec_col="embedding",
        centroids=_SEM_CENTS,
        corpus_dir=str(tmp_path / f"corpus_{tag}"),
        index_dir=str(tmp_path / f"index_{tag}"),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        threshold=0.9,
    )
    kw.update(over)
    return kw


_BATCHES = [
    [(1, [1.0, 0.0]), (2, [-1.0, 0.0])],
    [(10, [0.99, 0.01]), (11, [0.3, 0.95])],   # 10 near-dups 1
    [(20, [-0.98, -0.02]), (21, [0.31, 0.94])],  # both near-dup indexed
    [(30, [0.0, -1.0])],                          # fresh direction
]


def _run_stream(spark, tmp_path, tag, compact_after):
    """Drain _BATCHES one file per drain; return (survivor ids, index docs)."""
    import os

    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        _committed_index_paths,
        semantic_ingest_stream,
    )
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        _read_watermark,
    )

    src = tmp_path / f"src_{tag}"
    src.mkdir()
    kw = _stream_kwargs(tmp_path, tag, compact_after=compact_after)
    for i, rows in enumerate(_BATCHES):
        _land(spark, tmp_path, src, rows, f"f{i}.parquet")
        semantic_ingest_stream(spark, str(src), **kw)
    survivors = sorted(
        r["vec_id"]
        for r in spark.read.parquet(kw["corpus_dir"]).collect()
    )
    wm = _read_watermark(kw["index_dir"])
    paths = _committed_index_paths(kw["index_dir"], wm)
    docs = sorted(
        r["doc"] for r in spark.read.parquet(*paths).collect()
    )
    return survivors, docs, kw["index_dir"]


def test_semantic_index_compaction_parity(spark, tmp_path):
    """Decisions must be bit-identical with compaction forced on every
    batch vs never compacting, and the compacted layout must actually
    shrink to one seg + the recent tail."""
    import glob as globmod
    import os

    s_ref, d_ref, _ = _run_stream(spark, tmp_path, "ref", compact_after=10**6)
    s_cmp, d_cmp, idx = _run_stream(spark, tmp_path, "cmp", compact_after=1)
    assert s_cmp == s_ref
    assert d_cmp == d_ref
    # layout: a consolidated segment exists, absorbed batch dirs are gone
    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        _read_base_seg,
    )

    gen, upto = _read_base_seg(idx)
    assert gen is not None and upto >= 1
    segs = globmod.glob(os.path.join(idx, "seg=*"))
    assert segs == [os.path.join(idx, f"seg={gen}")]
    leftover = [
        int(os.path.basename(d).split("=", 1)[1])
        for d in globmod.glob(os.path.join(idx, "batch=*"))
    ]
    assert all(b > upto for b in leftover)


def test_semantic_index_compaction_absorbs_legacy_root_files(spark, tmp_path):
    """Round-7 root-level index files must be folded into the first
    segment and deleted; a lingering legacy file after the pointer exists
    must never be read again (no double-counting)."""
    import glob as globmod
    import os

    s, d, idx = _run_stream(spark, tmp_path, "leg", compact_after=10**6)

    # retrofit a legacy layout: move batch=0's part file to the root
    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        _committed_index_paths,
        _maybe_compact_index,
        _read_base_seg,
    )
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        _read_watermark,
    )
    import shutil

    b0 = os.path.join(idx, "batch=0")
    part = globmod.glob(os.path.join(b0, "*.parquet"))[0]
    shutil.move(part, os.path.join(idx, "legacy-part.parquet"))
    shutil.rmtree(b0)
    wm = _read_watermark(idx)
    before = sorted(
        r["doc"]
        for r in spark.read.parquet(*_committed_index_paths(idx, wm)).collect()
    )
    assert before == d  # legacy file readable pre-compaction

    _maybe_compact_index(
        spark, idx, wm, compact_after=0,
        index_cols=["doc", "cell", "vec", "nrm", "c_sim"],
    )
    gen, upto = _read_base_seg(idx)
    assert gen == 0 and upto == wm
    assert globmod.glob(os.path.join(idx, "*.parquet")) == []  # absorbed
    after = sorted(
        r["doc"]
        for r in spark.read.parquet(*_committed_index_paths(idx, wm)).collect()
    )
    assert after == before


def test_semantic_index_torn_compaction_recovery(spark, tmp_path):
    """Crash between the seg rename and the pointer replace leaves an
    unreferenced seg dir (plus possibly an orphan staging dir); readers
    must ignore both, and the next drain must sweep them and still make
    identical decisions."""
    import glob as globmod
    import os

    from datagouvfr_data_pipelines_spark.streaming.semantic_stream import (
        _committed_index_paths,
        semantic_ingest_stream,
    )
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        _read_watermark,
    )

    src = tmp_path / "src_torn"
    src.mkdir()
    kw = _stream_kwargs(tmp_path, "torn", compact_after=10**6)
    for i, rows in enumerate(_BATCHES[:2]):
        _land(spark, tmp_path, src, rows, f"f{i}.parquet")
        semantic_ingest_stream(spark, str(src), **kw)
    idx = kw["index_dir"]
    wm = _read_watermark(idx)
    clean = sorted(
        r["doc"]
        for r in spark.read.parquet(*_committed_index_paths(idx, wm)).collect()
    )

    # simulate the torn compaction: seg dir renamed, pointer never written
    torn_seg = os.path.join(idx, "seg=7")
    os.makedirs(torn_seg)
    with open(os.path.join(torn_seg, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")
    os.makedirs(os.path.join(idx, "seg=8.tmp"))

    # readers ignore the unreferenced seg (no pointer names it)
    assert sorted(
        r["doc"]
        for r in spark.read.parquet(*_committed_index_paths(idx, wm)).collect()
    ) == clean

    # next drain sweeps the orphans at sink entry and proceeds normally
    _land(spark, tmp_path, src, _BATCHES[2], "f2.parquet")
    semantic_ingest_stream(spark, str(src), **kw)
    assert not os.path.exists(torn_seg)
    assert not os.path.exists(os.path.join(idx, "seg=8.tmp"))
    survivors = sorted(
        r["vec_id"] for r in spark.read.parquet(kw["corpus_dir"]).collect()
    )
    assert survivors == [1, 2, 11]


# --------------------------------------------------------------------------
# Text-tier fingerprint index: append-only commit + compaction (round 9)
# --------------------------------------------------------------------------

_DOCS_SCHEMA = "doc_id long, text string"
_DOC_BATCHES = [
    [(1, "the quick brown fox jumps over the lazy dog"),
     (2, "pack my box with five dozen liquor jugs")],
    [(10, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
     (11, "jackdaws love my big sphinx of quartz")],
    [(20, "pack my box with five dozen liquor jugs today"),  # near-dup of 2
     (21, "how vexingly quick daft zebras jump")],
    [(30, "sphinx of black quartz judge my vow")],
]


def _run_text_stream(spark, tmp_path, tag, compact_after):
    import glob as globmod
    import os
    import shutil

    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        _read_watermark,
        dedup_ingest_stream,
    )
    from datagouvfr_data_pipelines_spark.streaming.index_commit import (
        committed_index_paths,
    )

    src = tmp_path / f"tsrc_{tag}"
    src.mkdir()
    corpus_dir = str(tmp_path / f"tcorpus_{tag}")
    index_dir = str(tmp_path / f"tindex_{tag}")

    def land(rows, name):
        stage = str(tmp_path / f"tstage_{tag}")
        spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = globmod.glob(stage + "/part-*.parquet")[0]
        shutil.move(part, str(src / name))

    kw = dict(
        schema=_DOCS_SCHEMA,
        id_col="doc_id",
        text_col="text",
        corpus_dir=corpus_dir,
        index_dir=index_dir,
        checkpoint_dir=str(tmp_path / f"tckpt_{tag}"),
        shingle_n=2,
        threshold=0.6,
        compact_after=compact_after,
    )
    for i, rows in enumerate(_DOC_BATCHES):
        land(rows, f"f{i}.parquet")
        dedup_ingest_stream(spark, str(src), **kw)
    survivors = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    )
    wm = _read_watermark(index_dir)
    paths = committed_index_paths(index_dir, wm)
    docs = sorted(r["doc"] for r in spark.read.parquet(*paths).collect())
    return survivors, docs, index_dir


def test_text_dedup_stream_append_only_commit_is_o_batch(spark, tmp_path):
    """The ingest path must never rewrite the accumulated index: each
    batch's fingerprints land in their own batch=<id> dir, and earlier
    committed dirs' files are untouched (same inodes/mtimes) by later
    ingests."""
    import glob as globmod
    import os

    s, d, idx = _run_text_stream(spark, tmp_path, "ob", compact_after=10**6)
    # exact dup 10 and near-dup 20 dropped; index holds only survivors
    assert s == [1, 2, 11, 21, 30]
    assert d == s
    dirs = sorted(globmod.glob(os.path.join(idx, "batch=*")))
    assert [os.path.basename(x) for x in dirs] == [
        "batch=0", "batch=1", "batch=2", "batch=3",
    ]
    # no legacy root rewrite happened
    assert globmod.glob(os.path.join(idx, "*.parquet")) == []


def test_text_dedup_stream_compaction_parity(spark, tmp_path):
    """Forced compaction must not change a single decision, and the
    layout must collapse to one segment + the recent tail."""
    import glob as globmod
    import os

    from datagouvfr_data_pipelines_spark.streaming.index_commit import (
        read_base_seg,
    )

    s_ref, d_ref, _ = _run_text_stream(
        spark, tmp_path, "tref", compact_after=10**6
    )
    s_cmp, d_cmp, idx = _run_text_stream(
        spark, tmp_path, "tcmp", compact_after=1
    )
    assert s_cmp == s_ref
    assert d_cmp == d_ref
    gen, upto = read_base_seg(idx)
    assert gen is not None and upto >= 1
    segs = globmod.glob(os.path.join(idx, "seg=*"))
    assert segs == [os.path.join(idx, f"seg={gen}")]
    leftover = [
        int(os.path.basename(p).split("=", 1)[1])
        for p in globmod.glob(os.path.join(idx, "batch=*"))
    ]
    assert all(b > upto for b in leftover)


def test_text_dedup_stream_legacy_layout_upgrade(spark, tmp_path):
    """A round-8 single-dir index (root part files + _last_batch) must
    keep deduping correctly under the new code, and the first compaction
    must absorb the legacy files."""
    import glob as globmod
    import os
    import shutil

    from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
        build_dedup_index,
    )
    from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
        _read_watermark,
        dedup_ingest_stream,
    )
    from datagouvfr_data_pipelines_spark.streaming.index_commit import (
        committed_index_paths,
        maybe_compact_index,
        read_base_seg,
    )
    from datagouvfr_data_pipelines_spark.io.writers import write_parquet

    index_dir = str(tmp_path / "lidx")
    # build the legacy layout directly: root-level part files, no
    # watermark (a fresh checkpoint restarts batch ids at 0, so a stale
    # legacy watermark would no-op the new stream's first batches — the
    # pre-existing-index state a fresh stream adopts is "rows, no ledger")
    legacy = spark.createDataFrame(_DOC_BATCHES[0], _DOCS_SCHEMA)
    write_parquet(
        build_dedup_index(legacy, "doc_id", "text", 64, 8, 2), index_dir
    )

    src = tmp_path / "lsrc"
    src.mkdir()
    stage = str(tmp_path / "lstage")
    df = spark.createDataFrame(_DOC_BATCHES[1], _DOCS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(
        globmod.glob(stage + "/part-*.parquet")[0], str(src / "f1.parquet")
    )
    dedup_ingest_stream(
        spark, str(src),
        schema=_DOCS_SCHEMA, id_col="doc_id", text_col="text",
        corpus_dir=str(tmp_path / "lcorpus"), index_dir=index_dir,
        checkpoint_dir=str(tmp_path / "lckpt"),
        shingle_n=2, threshold=0.6,
    )
    # exact dup of legacy doc 1 dropped; fresh doc 11 kept
    survivors = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "lcorpus")).collect()
    )
    assert survivors == [11]
    wm = _read_watermark(index_dir)
    before = sorted(
        r["doc"]
        for r in spark.read.parquet(
            *committed_index_paths(index_dir, wm)
        ).collect()
    )
    assert before == [1, 2, 11]  # legacy root + new batch dir both read

    maybe_compact_index(
        spark, index_dir, wm, compact_after=0,
        index_cols=["doc", "content_sha", "sig", "band_hashes"],
    )
    gen, upto = read_base_seg(index_dir)
    assert gen == 0 and upto == wm
    assert globmod.glob(os.path.join(index_dir, "*.parquet")) == []
    after = sorted(
        r["doc"]
        for r in spark.read.parquet(
            *committed_index_paths(index_dir, wm)
        ).collect()
    )
    assert after == before


# --------------------------------------------------------------------------
# Web-corpus scalar ops: html_to_text + canonicalize_url (round 9)
# --------------------------------------------------------------------------

def test_html_to_text_semantics(spark):
    from datagouvfr_data_pipelines_spark.functions.text import html_to_text

    cases = [
        # script containing '<' and '&&' must vanish wholesale
        ("<p>keep</p><script>if (1 < 2 && x > 3) bad()</script>", "keep"),
        # style + comment removal, block newlines, inline tags as spaces
        ("<style>p{a:1}</style>A<br>B<!-- c -->; <b>D</b> E", "A\nB ; D E"),
        # entity decode, &amp; decoded LAST (no double decode)
        ("&lt;tag&gt; &amp;amp; &copy; &mdash; &nbsp;x", "<tag> &amp; © — x"),
        # whitespace discipline: collapse runs, blank-line cap, edge trim
        ("  <p>a</p>\n\n\n\n<p>b</p>  ", "a\n\nb"),
        # null safe
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", html_to_text("html").alias("out")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_html_to_text_is_udf_free_and_sql_twin_matches(spark):
    """The chain must stay in whole-stage codegen (no EvalPython), and
    the DuckDB twin must produce the identical string on a nasty page."""
    import duckdb

    from datagouvfr_data_pipelines_spark.functions.text import (
        html_to_text, html_to_text_sql,
    )

    page = (
        '<html><head><script type="text/js">a<b&&c>d</script>'
        "<style>.x{}</style></head><body><h1>T&eacute;st &amp; Co</h1>"
        "<ul><li>one</li><li>two</li></ul><p>fin&hellip;</p></body></html>"
    )
    df = spark.createDataFrame([(page,)], "html string")
    plan = df.select(html_to_text("html"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    spark_out = df.select(html_to_text("html").alias("o")).collect()[0]["o"]
    duck_out = duckdb.connect().execute(
        "SELECT " + html_to_text_sql("?"), [page]
    ).fetchone()[0]
    assert spark_out == duck_out


def test_canonicalize_url_rules(spark):
    from datagouvfr_data_pipelines_spark.functions.text import (
        canonicalize_url,
    )

    cases = [
        # case, default port, fragment, tracking params, param sort
        ("HTTPS://Ex.COM:443/A/b?utm_source=x&z=1&a=2#f",
         "https://ex.com/A/b?a=2&z=1"),
        # http :80 stripped; :8080 kept
        ("HTTP://ex.com:80/x", "http://ex.com/x"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),
        # empty path -> /
        ("https://ex.com", "https://ex.com/"),
        # tracking-only query drops its '?'
        ("https://ex.com/p?gclid=1&fbclid=2&ref=3&utm_campaign=z",
         "https://ex.com/p"),
        # path case preserved, percent-encoding untouched, 'ref' exact
        # (a 'referrer' param is NOT tracking)
        ("https://ex.com/P%41th?referrer=k&b=1",
         "https://ex.com/P%41th?b=1&referrer=k"),
        # scheme-less input passes through UNCHANGED — canonicalizing
        # would collapse every such URL onto '://'+path and falsely
        # merge distinct documents in the exact-URL dedup
        ("example.com/a", "example.com/a"),
        ("/x?b=1", "/x?b=1"),
        ("foo.org/b", "foo.org/b"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url("url").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonicalize_url_idempotent(spark):
    """THE canonicalizer property: a canonical URL re-canonicalized is
    itself — checked over messy fuzz inputs in one plan."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        canonicalize_url,
    )

    import random
    rng = random.Random(7)
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS"])
        host = rng.choice(["Ex.COM", "a.b.example.org", "X9.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/A/b", "/p%20q", "/x/y/z/"])
        params = rng.sample(
            ["a=1", "z=9", "utm_source=t", "gclid=g", "b=", "ref=r",
             "c=%C3%A9", "referrer=k"],
            rng.randrange(0, 5),
        )
        frag = rng.choice(["", "#top", "#a/b?c=1"])
        urls.append(
            f"{scheme}://{host}{port}{path}"
            + ("?" + "&".join(params) if params else "") + frag
        )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url("url")
    bad = (
        df.select(
            once.alias("c1"),
            canonicalize_url(once).alias("c2"),
        )
        .where(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert not bad, bad[:5]



def test_fix_double_utf8_gates(spark):
    """Exact repair of double-encoded Latin-1 text (including corruptions
    that contain C1 control bytes, like times-sign U+00D7 -> C3 97), and
    the three pass-through gates: no marker chars, non-Latin-1 input,
    and ASCII fixed points."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        fix_double_utf8,
    )

    latin1 = "l'\u00e9t\u00e9 \u00e0 Paris, \u00e7a co\u00fbte cher"
    with_ctrl = "math: \u00b2 \u00d7 3"  # corrupt form carries U+0097

    def corrupt(s):
        return s.encode("utf-8").decode("iso-8859-1")

    cases = [
        (corrupt(latin1), latin1),
        (corrupt(with_ctrl), with_ctrl),
        # real accents but no U+00C2/C3 markers: untouched
        (latin1, latin1),
        ("plain ascii", "plain ascii"),
        (None, None),
        # marker present but a non-Latin-1 char (euro) blocks the repair
        ("\u00c3\u00a9 \u20ac", "\u00c3\u00a9 \u20ac"),
        # Latin-1-only text with a marker whose Latin-1 bytes are NOT
        # valid UTF-8 \u2014 the Spark-4 crash class (decode raises
        # MALFORMED_CHARACTER_CODING unless gated by is_valid_utf8):
        # ordinary Portuguese/French text must pass through unchanged,
        # not kill the task.
        ("S\u00c3O PAULO", "S\u00c3O PAULO"),
        ("\u00c2ge", "\u00c2ge"),
        ("\u00c2", "\u00c2"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, s string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select("i", fix_double_utf8("s").alias("o")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)



def test_curate_corpus_preprocess_web_stage(spark):
    """The crawl-ingest stage: HTML-wrapped AND double-encoded inputs
    through preprocess_web=True must produce the same kept doc ids as
    the clean text through the plain pipeline, with pure-markup pages
    dropped under their own ledger stage."""
    from datagouvfr_data_pipelines_spark.pipelines.corpus import (
        curate_corpus,
    )

    texts = {
        1: "The quick brown fox jumps over the lazy dog and keeps "
           "running through the quiet forest for a long while today.",
        2: "Pack my box with five dozen liquor jugs before the market "
           "closes and the evening crowd arrives near the old square.",
        3: "l'\u00e9t\u00e9 \u00e0 Paris se passe bien et la ville "
           "reste agr\u00e9able malgr\u00e9 la chaleur de la saison.",
    }

    def wrap(s):
        return (
            "<html><head><script>if (1<2&&3>2) t();</script></head>"
            "<body><p>" + s + "</p></body></html>"
        )

    def corrupt(s):
        return s.encode("utf-8").decode("iso-8859-1")

    clean = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    web_rows = [
        (1, wrap(texts[1])),
        (2, wrap(texts[2])),
        (3, wrap(corrupt(texts[3]))),     # HTML + mojibake
        (9, "<html><body><style>x{}</style></body></html>"),  # pure markup
    ]
    web = spark.createDataFrame(web_rows, "doc_id long, text string")

    kw = dict(min_quality=0.0, neardup_threshold=0.95)
    plain_kept = sorted(
        r["doc_id"] for r in curate_corpus(clean, **kw)["kept"].collect()
    )
    res = curate_corpus(web, preprocess_web=True, **kw)
    web_kept = sorted(r["doc_id"] for r in res["kept"].collect())
    assert web_kept == plain_kept == [1, 2, 3]
    # the recovered text is the clean text (extraction + repair exact)
    got3 = {
        r["doc_id"]: r["text"] for r in res["kept"].collect()
    }[3]
    assert got3 == texts[3]
    stages = {
        r["doc_id"]: r["stage"] for r in res["dropped"].collect()
    }
    assert stages.get(9) == "web_extract_empty"
