"""Salted join, applyInPandas grouped ops, stateful streaming session op."""

from __future__ import annotations

import glob
import shutil

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.grouped_custom import (
    distribution_bins_fixed,
    grouped_normalize,
)
from datagouvfr_data_pipelines_spark.operators.joins import salted_join
from datagouvfr_data_pipelines_spark.streaming.stateful import sessionize_stream


def test_salted_join_matches_plain_join(spark):
    # one hot key (9 of 12 rows) + dim table
    fact = spark.createDataFrame(
        [("hot", i) for i in range(9)] + [("a", 1), ("b", 2), ("c", 3)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("a", "A"), ("b", "B")], "k string, label string"
    )
    plain = {(r["k"], r["v"], r["label"]) for r in fact.join(dim, "k").collect()}
    salted = {
        (r["k"], r["v"], r["label"])
        for r in salted_join(fact, dim, "k", salt_buckets=4).collect()
    }
    assert salted == plain
    assert len(salted) == 11  # 9 hot + a + b; c unmatched dropped (inner)


def test_distribution_bins_fixed(spark):
    import random

    random.seed(7)
    rows = [("paris", float(random.randint(1000, 500000))) for _ in range(500)]
    rows += [("tinyville", 100.0)] * 5  # below the 100-row floor
    df = spark.createDataFrame(rows, "commune string, prix double")
    out = distribution_bins_fixed(df, ["commune"], "prix", min_rows=100)
    got = {r["commune"]: r for r in out.collect()}
    assert set(got) == {"paris"}          # floor excluded tinyville
    r = got["paris"]
    assert len(r["bins"]) == 11 and len(r["volumes"]) == 10
    assert sum(r["volumes"]) == 500        # histogram conserves rows
    assert all(b2 > b1 for b1, b2 in zip(r["bins"], r["bins"][1:]))  # repaired edges


def test_grouped_normalize(spark):
    df = spark.createDataFrame(
        [("g1", 10.0), ("g1", 20.0), ("g1", 30.0), ("g2", 5.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["normalized"] for r in grouped_normalize(df, ["g"], "v").collect()}
    assert out[("g1", 10.0)] == 0.0 and out[("g1", 30.0)] == 1.0
    assert out[("g1", 20.0)] == 0.5
    assert out[("g2", 5.0)] == 0.0  # degenerate single-value group


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState keeps sessions open ACROSS micro-batches."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(rows, name):
        stage = str(tmp_path / "stage")
        spark.createDataFrame(rows, "user_id long, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(glob.glob(stage + "/part-*.parquet")[0], str(src / name))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    land([(1, t0), (1, t0 + dt.timedelta(minutes=5))], "b1.parquet")

    schema = "user_id long, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = sessionize_stream(stream, gap_seconds=1800)
    results = []

    def sink(batch_df, batch_id):
        results.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(results) == 1
    assert (results[0]["session_id"], results[0]["n_events"]) == (1, 2)

    # batch 2: one event 10 min later (same session), one 2 h later (new)
    land(
        [(1, t0 + dt.timedelta(minutes=15)), (1, t0 + dt.timedelta(hours=3))],
        "b2.parquet",
    )
    q2 = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    by_session = {r["session_id"]: r for r in results[1:]}
    # session 1 extended to 3 events (state survived the batch boundary),
    # session 2 opened with 1 event
    assert by_session[1]["n_events"] == 3
    assert by_session[2]["n_events"] == 1


def test_minhash_merge_equals_direct(spark):
    """MinHash signatures are mergeable states: elementwise min. Pins
    (1) the defining min property, (2) single-batch passthrough, and
    (3) merge-tree associativity — so incremental signature maintenance
    gives the same index as a full rebuild."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        minhash_merge_states,
        minhash_signatures,
    )

    def sig_of(rows):
        df = spark.createDataFrame(rows, "id long, text string")
        return minhash_signatures(df, "id", "text", k=16)

    b1 = sig_of([(1, "alpha beta gamma delta epsilon zeta"),
                 (2, "one two three four five six seven")])
    b2 = sig_of([(1, "eta theta iota kappa lambda mu nu"),
                 (3, "eight nine ten eleven twelve thirteen")])
    b3 = sig_of([(1, "xi omicron pi rho sigma tau upsilon")])

    s1 = {r["doc"]: r["sig"] for r in b1.collect()}
    s2 = {r["doc"]: r["sig"] for r in b2.collect()}
    merged = {r["doc"]: r["sig"] for r in minhash_merge_states([b1, b2]).collect()}
    # defining property: elementwise min for shared docs
    assert merged[1] == [min(a, b) for a, b in zip(s1[1], s2[1])]
    # passthrough for one-sided docs
    assert merged[2] == s1[2] and merged[3] == s2[3]
    # associativity: any merge tree gives the same state
    left = minhash_merge_states([minhash_merge_states([b1, b2]), b3])
    flat = minhash_merge_states([b1, b2, b3])
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, flat.collect()))


def test_asof_join_nearest_directions_ties_and_tolerance(spark):
    import datetime as dt

    from datagouvfr_data_pipelines_spark.operators.joins import (
        asof_join_nearest,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("k", t(10), "back_nearer"),    # states at 09 and 13 -> 09 (1m vs 3m)
            ("k", t(12), "fwd_nearer"),     # states at 09 and 13 -> 13 (3m vs 1m)
            ("k", t(11), "tie_prefers_back"),  # 09 vs 13 = 2m both -> 09
            ("k", t(0), "no_back"),         # before all states -> 09 (forward)
            ("k", t(50), "no_fwd"),         # after all states -> 13 (backward)
            ("q", t(30), "no_match"),       # key with no states at all
        ],
        "k string, ts timestamp, label string",
    )
    right = spark.createDataFrame(
        [("k", t(9), "s9"), ("k", t(13), "s13")],
        "k string, ts timestamp, sid string",
    )
    out = {
        r["label"]: (r["sid"], r["__asof_delta_s"])
        for r in asof_join_nearest(left, right, "k", "ts", "ts", ["sid"]).collect()
    }
    assert out["back_nearer"] == ("s9", 60)
    assert out["fwd_nearer"] == ("s13", 60)
    assert out["tie_prefers_back"] == ("s9", 120)
    assert out["no_back"] == ("s9", 540)
    assert out["no_fwd"] == ("s13", 2220)
    assert out["no_match"] == (None, None)

    # tolerance: 90s keeps only the 60s matches
    tol = {
        r["label"]: r["sid"]
        for r in asof_join_nearest(
            left, right, "k", "ts", "ts", ["sid"], tolerance_seconds=90
        ).collect()
    }
    assert tol["back_nearer"] == "s9" and tol["fwd_nearer"] == "s13"
    assert tol["tie_prefers_back"] is None and tol["no_back"] is None


def test_global_dense_ids_match_single_window(spark):
    from datagouvfr_data_pipelines_spark.operators.windows import global_dense_ids

    rows = [(k,) for k in [42, 7, 99, 1, 55, 23, 88, 3, 61, 17]]
    df = spark.createDataFrame(rows, "k long").repartition(5)
    for n in (2, 3, 8):
        got = {
            (r.k, r.row_id)
            for r in global_dense_ids(df, ["k"], num_partitions=n).collect()
        }
        want = {(k, i + 1) for i, k in enumerate(sorted(x[0] for x in rows))}
        assert got == want, n


def test_global_prefix_sum_matches_single_window(spark):
    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_prefix_sum,
    )

    # keys with heavy ties (bucket-boundary stress) + a unique tiebreaker
    rows = [((i * 7) % 5, i, (i * 13) % 40 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "key long, id long, v long").repartition(9)
    want_asc, want_desc, acc = {}, {}, 0
    for key, i, v in sorted(rows, key=lambda r: (r[0], r[1])):
        acc += v
        want_asc[(key, i)] = acc
    acc = 0
    for key, i, v in sorted(rows, key=lambda r: (-r[0], r[1])):
        acc += v
        want_desc[(key, i)] = acc
    for nb in (1, 4, 16):
        got = {
            (r.key, r.id): r.cum
            for r in global_prefix_sum(
                df,
                "key",
                [F.col("key").asc(), F.col("id").asc()],
                "v",
                alias="cum",
                n_buckets=nb,
            ).collect()
        }
        assert got == want_asc, nb
        got = {
            (r.key, r.id): (r.cum, r.tot)
            for r in global_prefix_sum(
                df,
                "key",
                [F.col("key").desc(), F.col("id").asc()],
                "v",
                alias="cum",
                n_buckets=nb,
                descending=True,
                total_alias="tot",
            ).collect()
        }
        total = sum(r[2] for r in rows)
        assert got == {k: (c, total) for k, c in want_desc.items()}, nb


def test_global_prefix_sum_rejects_null_order_key(spark):
    """Round-4 advice: NULL order keys previously bucketed to a None key and
    crashed the driver fold with an unorderable TypeError; now they fail
    fast with a clear message."""
    import pytest

    from datagouvfr_data_pipelines_spark.operators.windows import (
        global_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1, 1, 5), (None, 2, 7), (3, 3, 9)], "key long, id long, v long"
    )
    with pytest.raises(ValueError, match="NULL"):
        global_prefix_sum(
            df, "key", [F.col("key").asc(), F.col("id").asc()], "v"
        )


def test_skyline_2d_matches_bruteforce(spark):
    from datagouvfr_data_pipelines_spark.operators.windows import skyline_2d

    # deterministic pseudo-random points incl. duplicates + dominance ties
    pts = [((i * 37) % 23, (i * 53) % 19) for i in range(120)]
    pts += [(0, 18), (0, 18)]  # duplicate extreme point
    df = spark.createDataFrame(pts, "x long, y long").repartition(7)
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    uniq = set(pts)
    want = sorted(
        (x, y)
        for (x, y) in uniq
        if not any(
            bx <= x and by >= y and (bx < x or by > y) for (bx, by) in uniq
        )
    )
    assert got == want
