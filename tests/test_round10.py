"""Round-10 additions: single-decode cp1252/Latin-1 mojibake repair
(``fix_latin1_utf8``), per-domain boilerplate removal, and the nightly
regression gate."""

from __future__ import annotations

import pyspark.sql.functions as F


def _sloppy_cp1252(b: bytes) -> str:
    """UTF-8 bytes mis-read as Windows-1252 with the Latin-1 fallback
    every real decoder applies to the 5 undefined bytes — the exact
    corruption ``fix_latin1_utf8`` inverts."""
    out = []
    for byte in b:
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def test_fix_latin1_utf8_gates(spark):
    """Exact repair of UTF-8-read-as-cp1252 text (the 'â€™' class the
    Latin-1-only double-encode repair cannot touch), superset behavior
    on the plain Latin-1 bridge, and pass-through on every gate: healthy
    accented text, ASCII, non-cp1252-encodable input, NULL."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        fix_latin1_utf8,
    )

    curly = "l’été — ça coûte €9"
    latin1 = "l'été à Paris"

    cases = [
        # cp1252 single-decode corruption: bit-exact recovery
        (_sloppy_cp1252(curly.encode("utf-8")), curly),
        # Latin-1 bridge (what fix_double_utf8 covers): also recovered
        (latin1.encode("utf-8").decode("iso-8859-1"), latin1),
        # healthy accented text: marker present, bytes NOT valid UTF-8
        ("SÃO PAULO", "SÃO PAULO"),
        ("Âge", "Âge"),
        ("début", "début"),
        ("plain ascii", "plain ascii"),
        (None, None),
        # non-cp1252-encodable char blocks the repair
        ("日本語 Ã©", "日本語 Ã©"),
        # healthy text made only of cp1252 specials: no marker, unchanged
        ("‘quoted’ — dash …", "‘quoted’ — dash …"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, s string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select("i", fix_latin1_utf8("s").alias("o")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_fix_latin1_utf8_roundtrip_fuzz(spark):
    """Property: for any text of Latin-1 chars + cp1252 specials, the
    UTF-8-read-as-sloppy-cp1252 corruption is repaired bit-for-bit; and
    realistic CLEAN text is a fixed point (never 'repaired')."""
    import random

    from datagouvfr_data_pipelines_spark.functions.text import (
        fix_latin1_utf8,
    )

    rng = random.Random(10)
    alphabet = (
        "abcdefghij XYZ.,;!?0123456789"
        "éèàûïÉÔñß§"
        "‘’“”–—…€™œ"
    )
    originals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 60)))
        for _ in range(300)
    ]
    corrupted = [_sloppy_cp1252(s.encode("utf-8")) for s in originals]
    df = spark.createDataFrame(
        list(enumerate(corrupted)), "i int, s string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select("i", fix_latin1_utf8("s").alias("o")).collect()
    }
    bad = [
        (originals[i], corrupted[i], got[i])
        for i in range(len(originals))
        if got[i] != originals[i]
    ]
    assert not bad, bad[:3]

    # clean-text fixed point: realistic words (accents NOT followed by
    # continuation-range chars, as in actual language) stay untouched
    words = [
        "café", "été", "naïve", "Straße",
        "mañana", "déjà", "vu", "the", "quick", "fox",
        "œuvre", "—", "‘yes’",
    ]
    clean = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 12)))
        for _ in range(300)
    ]
    df2 = spark.createDataFrame(list(enumerate(clean)), "i int, s string")
    got2 = {
        r["i"]: r["o"]
        for r in df2.select("i", fix_latin1_utf8("s").alias("o")).collect()
    }
    bad2 = [
        (clean[i], got2[i]) for i in range(len(clean)) if got2[i] != clean[i]
    ]
    assert not bad2, bad2[:3]


def test_curate_corpus_web_stage_repairs_cp1252(spark):
    """The crawl-ingest stage now covers the single-decode class: an
    HTML page whose text was UTF-8-read-as-cp1252 (curly quotes become
    'â€™') comes out of curate_corpus(preprocess_web=True) with the
    original text recovered exactly."""
    from datagouvfr_data_pipelines_spark.pipelines.corpus import (
        curate_corpus,
    )

    text = (
        "It’s a long document — with curly “quotes” "
        "and an ellipsis… plus enough plain words to pass the "
        "quality heuristics of the corpus pipeline today."
    )
    page = "<html><body><p>" + _sloppy_cp1252(text.encode("utf-8")) + "</p></body></html>"
    docs = spark.createDataFrame([(1, page)], "doc_id long, text string")
    res = curate_corpus(
        docs, preprocess_web=True, min_quality=0.0, neardup_threshold=0.95
    )
    kept = res["kept"].collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["text"] == text


def test_boilerplate_removal_rules(spark):
    """Nav/footer lines repeated across a domain's pages collapse; body
    text survives; small domains (< min_pages) are untouched; blank
    lines are structure and always survive."""
    from datagouvfr_data_pipelines_spark.functions.text import (
        boilerplate_removal,
    )

    nav = "HOME | ABOUT | CONTACT"
    foot = "(c) 2026 example.com"
    rows = [
        # example.com: 4 pages, nav+footer on all, bodies unique
        (1, "example.com", f"{nav}\nalpha body one\n\n{foot}"),
        (2, "example.com", f"{nav}\nbeta body two\n{foot}"),
        (3, "example.com", f"{nav}\ngamma body three\n{foot}"),
        (4, "example.com", f"{nav}\n{foot}"),  # pure boilerplate page
        # shared body line on only 2/4 pages: below the 0.5 threshold
        (5, "other.org", "unique five\nshared line"),
        (6, "other.org", "unique six\nshared line"),
        (7, "other.org", "unique seven"),
        (8, "other.org", "unique eight"),
        # tiny domain (2 pages < min_pages=3): identical lines kept
        (9, "tiny.net", f"{nav}\nniner"),
        (10, "tiny.net", f"{nav}\ntenner"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_kept"])
        for r in boilerplate_removal(
            df, "doc_id", "text", "domain", max_domain_frac=0.5, min_pages=3
        ).collect()
    }
    # nav (4/4) and footer (4/4) exceed 0.5 * 4: stripped; blank kept
    assert got[1] == ("alpha body one\n", 4, 2)
    assert got[2] == ("beta body two", 3, 1)
    assert got[4] == ("", 2, 0)  # fully-boilerplate page -> empty
    # 2/4 = 0.5 is NOT > 0.5: shared line survives (strict threshold)
    assert got[5] == ("unique five\nshared line", 2, 2)
    # small domain untouched despite 2/2 nav repetition
    assert got[9] == (f"{nav}\nniner", 2, 2)


def test_curate_corpus_boilerplate_stage(spark):
    """curate_corpus(boilerplate_domain_frac=...) strips domain chrome
    before quality/dedup see it, and pages left empty drop under the
    'boilerplate' ledger stage."""
    from datagouvfr_data_pipelines_spark.pipelines.corpus import (
        curate_corpus,
    )

    nav = "Cookie consent banner | Accept all | Reject"
    bodies = {
        1: "The quick brown fox jumps over the lazy dog and keeps "
           "running through the quiet forest for a long while today.",
        2: "Pack my box with five dozen liquor jugs before the market "
           "closes and the evening crowd arrives near the old square.",
        3: "Sphinx of black quartz judge my vow while the caravan "
           "crosses the dunes under a pale and silent morning sky.",
    }
    rows = [(k, "site.com", f"{nav}\n{v}") for k, v in bodies.items()]
    rows.append((9, "site.com", nav))  # chrome-only page
    docs = spark.createDataFrame(
        rows, "doc_id long, domain string, text string"
    )
    res = curate_corpus(
        docs,
        min_quality=0.0,
        neardup_threshold=0.95,
        boilerplate_domain_frac=0.5,
        boilerplate_min_pages=3,
    )
    kept = {r["doc_id"]: r["text"] for r in res["kept"].collect()}
    assert sorted(kept) == [1, 2, 3]
    for k, v in bodies.items():
        assert kept[k] == v  # nav gone, body exact
    stages = {r["doc_id"]: r["stage"] for r in res["dropped"].collect()}
    assert stages.get(9) == "boilerplate"


def _load_gate():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "nightly_gate",
        Path(__file__).resolve().parent.parent / "scripts" / "nightly_gate.py",
    )
    gate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gate)
    return gate


def _gate_row(ts, value, queries, oracles=None):
    bench = {
        "metric": "headline_suite_seconds",
        "value": value,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    if oracles is not None:
        bench["oracle_duckdb_sec"] = oracles
        bench["oracle_total_sec"] = round(sum(oracles.values()), 3)
        bench["oracle_comparable_spark_sec"] = round(
            sum(v for k, v in queries.items() if k in oracles), 3
        )
    return {"ts": ts, "bench": bench}


def test_nightly_gate_rules(tmp_path):
    """The round-13 same-row-ratio gate: ambient load that inflates BOTH
    engines passes (walls +2.5x with flat ratios), an oracle-side wobble
    alone passes (ratio up, wall flat), a real plan regression (wall AND
    same-row ratio both >2x) fails, missing-query coverage loss fails,
    faster never fails, <2 rows is a no-op pass."""
    import json

    gate = _load_gate()
    orc = {"big": 1.0, "small": 0.1}
    base = [
        _gate_row("t0", 26.0, {"big": 2.0, "small": 0.4}, orc),
        _gate_row("t1", 27.0, {"big": 2.1, "small": 0.38}, orc),
    ]

    # ambient: both engines inflate 1.9x -> ratios flat -> pass (a >2x
    # aggregate wall move trips the absolute alarm by design, so the
    # ambient case sits under it)
    hot = _gate_row(
        "t2", 50.0, {"big": 3.8, "small": 0.76},
        {"big": 1.9, "small": 0.19},
    )
    assert gate.compare_rows(base, hot) == []
    # oracle-side wobble on one query: its ratio jumps 4x but the wall is
    # flat (and the aggregate barely moves) -> pass
    wob = _gate_row("t2", 26.0, {"big": 2.0, "small": 0.4},
                    {"big": 1.0, "small": 0.025})
    assert gate.compare_rows(base, wob) == []
    # faster never fails
    assert gate.compare_rows(
        base, _gate_row("t2", 20.0, {"big": 1.0, "small": 0.1}, orc)
    ) == []

    # real 2x+ plan regression: one query's wall x2.2, oracle unchanged
    # -> wall AND same-row ratio both >2x -> fail
    f = gate.compare_rows(
        base, _gate_row("t2", 28.4, {"big": 4.4, "small": 0.4}, orc)
    )
    assert any("query big" in x and "ratio" in x for x in f)
    assert not any("small" in x for x in f)
    # no oracle column at all: the 2x wall alarm stands alone
    f = gate.compare_rows(
        [_gate_row("t0", 26.0, {"big": 2.0, "small": 0.4})],
        _gate_row("t2", 28.4, {"big": 4.4, "small": 0.4}),
    )
    assert any("query big" in x for x in f)
    assert not any("small" in x for x in f)
    # aggregate comparable-ratio regression (+30% with flat oracle)
    f = gate.compare_rows(
        base, _gate_row("t2", 34.0, {"big": 3.2, "small": 0.52}, orc)
    )
    assert any(x.startswith("aggregate comparable ratio") for x in f)
    # dropped query = coverage loss
    f = gate.compare_rows(base, _gate_row("t2", 26.0, {"big": 2.0}, {"big": 1.0}))
    assert any("small" in x and "missing" in x for x in f)

    # end-to-end main(): synthetic jsonl files
    p = tmp_path / "nb.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in base + [hot]) + "\n")
    assert gate.main(["gate", str(p)]) == 0
    p.write_text(
        "\n".join(
            json.dumps(r)
            for r in base
            + [_gate_row("t2", 28.4, {"big": 4.4, "small": 0.4}, orc)]
        )
        + "\n"
    )
    assert gate.main(["gate", str(p)]) == 1
    p.write_text(json.dumps(base[0]) + "\n")
    assert gate.main(["gate", str(p)]) == 0


def test_nightly_gate_committed_ledger_and_synthetic_regression():
    """VERDICT r11 #1 acceptance: the gate exits 0 on the COMMITTED
    ledger (same-code ambient pairs that failed the old wall-based
    rules), and a synthetic real regression injected into the newest row
    (one query's Spark wall x3, oracle untouched) still fails."""
    import copy
    import json
    from pathlib import Path

    gate = _load_gate()
    path = Path(__file__).resolve().parent.parent / "scripts" / "nightly_bench.jsonl"
    rows = [json.loads(line) for line in path.read_text().splitlines() if line.strip()]
    assert len(rows) >= 2
    # every committed consecutive pair passes (ambient-only moves)
    for i in range(1, len(rows)):
        refs = rows[max(0, i - 3):i]
        assert gate.compare_rows(refs, rows[i]) == [], f"pair {i} failed"
    # synthetic single-query x3 regression must still fail
    syn = copy.deepcopy(rows[-1])
    syn["bench"]["queries"]["q1_pricing_summary"] = round(
        syn["bench"]["queries"]["q1_pricing_summary"] * 3, 3
    )
    f = gate.compare_rows(rows[:-1][-3:], syn)
    assert any("q1_pricing_summary" in x for x in f)


def test_portable_id_hash_full_int64_range(spark):
    """The portable LCG hash must survive 64-bit ids (the suite-wide
    scale sweep crashed on ANSI long overflow at offset keys > 2^32):
    bit-identical to the Python reference AND to DuckDB at every
    magnitude, and the identity pre-reduction keeps small-id values
    unchanged."""
    import duckdb

    from datagouvfr_data_pipelines_spark.operators.sketches import (
        portable_id_hash,
    )

    ids = [0, 1, 7, 12345, 2**31 - 2, 2**31, 2**32 + 5, 37 * 2**32 + 99,
           2**62, 2**63 - 1]

    def ref(i):
        h1 = ((i % 2147483647) * 1103515245 + 12345) % 2147483647
        return (h1 * 784588716 + 997) % 2147483647

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", portable_id_hash("id").alias("h")).collect()
    }
    sql = ("(((id % 2147483647) * 1103515245 + 12345) % 2147483647 "
           "* 784588716 + 997) % 2147483647")
    con = duckdb.connect()
    for i in ids:
        assert got[i] == ref(i), i
        duck = con.execute(
            f"SELECT {sql} FROM (SELECT CAST(? AS BIGINT) AS id)", [i]
        ).fetchone()[0]
        assert got[i] == duck, i


def test_mjpeg_avi_real_frame_decode(spark):
    """sample_frames' default decoder walks MJPEG-in-AVI for real: each
    sampled frame is the source frame's JPEG, decoding BIT-EXACTLY back
    to the block-aligned fixture pixels; non-AVI payloads still take the
    deterministic stand-in branch."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        make_banded_test_rows,
        make_mjpeg_avi,
        parse_avi_mjpeg,
        sample_frames,
    )

    frames = [make_banded_test_rows(s) for s in range(3)]
    avi = make_mjpeg_avi(frames, 72, 64, fps=2)  # 500 ms per frame

    dur, frame_at, status = parse_avi_mjpeg(avi)
    assert (dur, status) == (1500, "decoded:mjpeg-avi")
    for k in range(3):
        dec = decode_jpeg_rgb24(frame_at(k * 500))
        assert dec is not None and (dec[0], dec[1]) == (72, 64)
        assert dec[2] == frames[k], k  # bit-exact pixels
    # past-the-end timestamps clamp to the final frame
    assert frame_at(99_000) == frame_at(1000)

    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a video payload"))],
        "media_id long, content binary",
    )
    out = sample_frames(df, "media_id", "content", every_ms=500).collect()
    mine = sorted(
        (r["frame_idx"], r["ts_ms"]) for r in out if r["media_id"] == 1
    )
    assert mine == [(0, 0), (1, 500), (2, 1000)]
    statuses = {r["media_id"]: r["decode_status"] for r in out}
    assert statuses[1] == "decoded:mjpeg-avi"
    assert statuses[2] == "fake-decoded"
    got1 = {
        r["frame_idx"]: bytes(r["frame"]) for r in out if r["media_id"] == 1
    }
    for k in range(3):
        assert decode_jpeg_rgb24(got1[k])[2] == frames[k], k


def test_mjpeg_avi_parser_rejects_non_mjpeg(spark):
    """The honest gate stays for codecs the container cannot decode: a
    structurally-valid AVI whose stream is NOT MJPG falls back to the
    stand-in decoder instead of emitting wrong frames."""
    import struct

    from datagouvfr_data_pipelines_spark.functions.udfs import (
        make_banded_test_rows, make_mjpeg_avi, parse_avi_mjpeg,
    )

    avi = bytearray(make_mjpeg_avi(
        [make_banded_test_rows(0)], 72, 64, fps=2
    ))
    i = avi.find(b"vidsMJPG")
    avi[i + 4 : i + 8] = b"H264"
    assert parse_avi_mjpeg(bytes(avi)) is None
    # truncated header / empty movi
    assert parse_avi_mjpeg(bytes(avi[:20])) is None
    assert parse_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"AVI ") is None
