"""Distributed logistic regression (functions/ml.py): learnability on a
separable problem, deterministic training under repartitioning, and the
teacher-student quality-classifier query."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.functions.ml import (
    logreg_fit,
    logreg_predict,
)


def _toy(spark):
    # y = 1 iff f1 + f2 > 1 (clean margin), 200 deterministic points
    rows = []
    for i in range(200):
        f1 = (i % 20) / 20.0
        f2 = ((i * 7) % 20) / 20.0
        rows.append((f1, f2, 1.0 if f1 + f2 > 1.0 else 0.0))
    return spark.createDataFrame(rows, "f1 double, f2 double, y double")


def test_logreg_learns_separable_boundary(spark):
    df = _toy(spark)
    w = logreg_fit(df, ["f1", "f2"], "y", iters=150, lr=2.0)
    scored = logreg_predict(df, w, ["f1", "f2"])
    acc = scored.where(
        ((F.col("p") >= 0.5) & (F.col("y") == 1.0))
        | ((F.col("p") < 0.5) & (F.col("y") == 0.0))
    ).count() / 200
    assert acc >= 0.95, (acc, w)


def test_logreg_training_is_partition_invariant(spark):
    df = _toy(spark)
    w1 = logreg_fit(df.repartition(13), ["f1", "f2"], "y", iters=20, lr=1.0)
    w2 = logreg_fit(df.coalesce(1), ["f1", "f2"], "y", iters=20, lr=1.0)
    assert w1 == w2  # bit-identical: nano-quantized gradient sums


def test_quality_classifier_query(spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    out = plans.queries()["t_quality_classifier"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    agree = sum(1 for r in rows if (r["p_good"] >= 0.5) == (r["teacher_label"] == 1))
    assert agree / len(rows) >= 0.85  # student tracks the teacher
    for r in rows[:50]:
        assert 0.0 <= r["p_good"] <= 1.0
