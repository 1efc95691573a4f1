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
