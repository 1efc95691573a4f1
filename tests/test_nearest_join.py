"""Unit tests for the grid-bucketed nearest-neighbor join
(operators/joins.py:nearest_neighbor_join)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.joins import nearest_neighbor_join


def _brute_force(probes, points):
    # all-pairs argmin with (dist, id) tie-break — the semantics the
    # bucketed join must reproduce whenever the true nearest point lies in
    # the probe's 3x3 cell neighborhood
    out = {}
    for qid, qx, qy in probes:
        best = None
        for pid, px, py in points:
            d = (qx - px) ** 2 + (qy - py) ** 2
            key = (d, pid)
            if best is None or key < best:
                best = key
        out[qid] = (best[1], best[0])
    return out


def test_nearest_join_matches_brute_force(spark):
    probes = [(i, float(i % 7) * 3.1, float(i % 5) * 2.7) for i in range(40)]
    points = [(100 + i, float(i % 9) * 2.3 + 0.5, float(i % 6) * 3.3 + 0.4) for i in range(30)]
    pdf = spark.createDataFrame(probes, "qid long, lon double, lat double")
    sdf = spark.createDataFrame(points, "sid long, lon double, lat double")
    got = {
        r["qid"]: (r["sid"], r["sqdist"])
        for r in nearest_neighbor_join(
            pdf, sdf, probe_id="qid", point_id="sid", cell_size=50.0
        ).collect()
    }
    want = _brute_force(probes, points)
    assert got == want


def test_nearest_join_tie_breaks_on_smaller_id(spark):
    pdf = spark.createDataFrame([(1, 0.0, 0.0)], "qid long, lon double, lat double")
    # two points equidistant from the probe -> smaller id wins
    sdf = spark.createDataFrame(
        [(9, 1.0, 0.0), (5, -1.0, 0.0)], "sid long, lon double, lat double"
    )
    rows = nearest_neighbor_join(
        pdf, sdf, probe_id="qid", point_id="sid", cell_size=10.0
    ).collect()
    assert len(rows) == 1
    assert rows[0]["sid"] == 5
    assert rows[0]["sqdist"] == 1.0


def test_nearest_join_drops_probes_outside_neighborhood(spark):
    # point 3 cells away -> no candidate in the 3x3 neighborhood -> dropped
    pdf = spark.createDataFrame([(1, 0.0, 0.0)], "qid long, lon double, lat double")
    sdf = spark.createDataFrame([(7, 35.0, 0.0)], "sid long, lon double, lat double")
    rows = nearest_neighbor_join(
        pdf, sdf, probe_id="qid", point_id="sid", cell_size=10.0
    ).collect()
    assert rows == []


def test_nearest_join_renames_colliding_point_id(spark):
    pdf = spark.createDataFrame([(1, 0.0, 0.0)], "pid long, lon double, lat double")
    sdf = spark.createDataFrame([(2, 1.0, 1.0)], "pid long, lon double, lat double")
    out = nearest_neighbor_join(
        pdf, sdf, probe_id="pid", point_id="pid", cell_size=10.0
    )
    assert set(out.columns) == {"pid", "pid_p", "sqdist"}
    row = out.collect()[0]
    assert (row["pid"], row["pid_p"]) == (1, 2)


def test_fuzzy_name_pairs_blocking_and_verify(spark):
    import pyspark.sql.functions as F

    from datagouvfr_data_pipelines_spark.operators.joins import fuzzy_name_pairs

    rows = [
        (1, "acme widget"),
        (2, "acmee widget"),   # 1 edit from 1, same block
        (3, "acme bolt"),      # different noun -> different block
        (4, "azure widget"),   # same block key (widget, 'a'), 4 edits from 1
        (5, "acme widget"),    # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    toks = F.split(F.col("name"), " ")
    out = fuzzy_name_pairs(
        df, "id", "name",
        block_exprs=[toks[1], F.substring(toks[0], 1, 1)],
        max_edit=2,
    )
    got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in out.collect())
    # (1,4)/(2,4)/(4,5) blocked together but beyond max_edit; 3 alone
    assert got == [(1, 2, 1), (1, 5, 0), (2, 5, 1)]

    # hot-block guardrail: cap 2 drops the whole (widget, a) block
    capped = fuzzy_name_pairs(
        df, "id", "name",
        block_exprs=[toks[1], F.substring(toks[0], 1, 1)],
        max_edit=2, max_block=2,
    )
    assert capped.count() == 0
