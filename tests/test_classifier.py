"""Distributed logistic-regression training (operators/classifier.py):
the Spark aggregation must reproduce the textbook full-batch GD exactly
(numpy twin), improve on separable data, and stay partial-aggregable."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.classifier import (
    logreg_metrics, logreg_score, logreg_train, reference_logreg_numpy)


@pytest.fixture(scope="module")
def xy(spark):
    rng = np.random.default_rng(3)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    # linearly separable-ish with noise
    y = ((1.5 * x1 - 0.8 * x2 + rng.normal(scale=0.5, size=n)) > 0) \
        .astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double").repartition(16)
    return df, np.column_stack([x1, x2]), y


def test_train_matches_numpy_reference(xy):
    df, X, y = xy
    for iters, lr, l2 in [(1, 1.0, 0.0), (5, 0.7, 0.0), (4, 1.0, 0.01)]:
        w_spark = logreg_train(df, ["x1", "x2"], "y",
                               iters=iters, lr=lr, l2=l2)
        w_np = reference_logreg_numpy(X, y, iters=iters, lr=lr, l2=l2)
        assert np.allclose(w_spark, w_np, rtol=1e-9, atol=1e-12), \
            (iters, lr, l2, w_spark, w_np)


def test_training_learns_the_separating_direction(xy):
    df, X, y = xy
    w = logreg_train(df, ["x1", "x2"], "y", iters=10, lr=1.0)
    # true direction is (+, -)
    assert w[1] > 0 and w[2] < 0
    m0 = logreg_metrics(df, [0.0, 0.0, 0.0], ["x1", "x2"], "y").first()
    m = logreg_metrics(df, w, ["x1", "x2"], "y").first()
    assert m["accuracy"] > 0.85 > m0["accuracy"] + 0.3
    assert m["mean_logloss"] < m0["mean_logloss"]


def test_score_is_narrow_and_bounded(spark, xy):
    df, _, _ = xy
    w = [0.1, 0.5, -0.5]
    scored = logreg_score(df, w, ["x1", "x2"])
    row = scored.agg(F.min("p_quality"), F.max("p_quality")).first()
    assert 0.0 < row[0] and row[1] < 1.0
    # zero-shuffle: score a frame with no repartition in its lineage
    plain = spark.range(0, 100).select(
        (F.col("id") * 0.01).alias("x1"), (F.col("id") * -0.02).alias("x2"))
    p = logreg_score(plain, w, ["x1", "x2"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p         # pure projection, zero shuffle


def test_gradient_pass_is_partial_aggregable(xy):
    df, _, _ = xy
    # the single-iteration gradient job must be a two-phase HashAggregate
    # (map-side partial), never a single-partition collect of rows
    from s3_redshift_backup_tool_spark.operators.classifier import (
        _sigmoid, _z)
    feats = [F.col("x1"), F.col("x2")]
    err = _sigmoid(_z([0.0, 0.0, 0.0], feats)) - F.col("y")
    agg = df.agg(F.avg(err).alias("g0"),
                 F.avg(err * feats[0]).alias("g1"),
                 F.avg(err * feats[1]).alias("g2"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "partial_avg" in plan or "partial" in plan.lower()


def test_mismatched_weights_rejected(spark, xy):
    df, _, _ = xy
    with pytest.raises(ValueError, match="3 weights for 1 features"):
        logreg_score(df, [0.1, 0.5, -0.5], ["x1"])
    with pytest.raises(ValueError, match="2 weights for 2 features"):
        logreg_metrics(df, [0.1, 0.5], ["x1", "x2"], "y")


def test_pr_curve_matches_numpy_confusion(xy):
    """logreg_pr_curve must reproduce the numpy confusion matrix and
    the guarded precision/recall/F1 at every threshold, including the
    degenerate ends: threshold > max(p) gives an empty positive set ->
    precision/F1 NULL (never 0/0), threshold 0.0 predicts everything
    positive -> recall 1."""
    from s3_redshift_backup_tool_spark.operators.classifier import (
        logreg_pr_curve)

    df, X, y = xy
    w = logreg_train(df, ["x1", "x2"], "y", iters=3, lr=1.0)
    ths = (0.0, 0.25, 0.5, 0.75, 1.01)
    got = {float(r["threshold"]): r
           for r in logreg_pr_curve(df, w, ["x1", "x2"], "y",
                                    thresholds=ths).collect()}
    assert set(got) == set(ths)

    Xb = np.hstack([np.ones((len(X), 1)), X])
    p = 1.0 / (1.0 + np.exp(-(Xb @ np.array(w))))
    for t in ths:
        pos = p >= t
        tp = int(np.sum(pos & (y == 1.0)))
        fp = int(np.sum(pos & (y != 1.0)))
        fn = int(np.sum(~pos & (y == 1.0)))
        tn = int(np.sum(~pos & (y != 1.0)))
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn), t
        exp_prec = tp / (tp + fp) if tp + fp else None
        exp_rec = tp / (tp + fn) if tp + fn else None
        if exp_prec is None:
            assert r["precision"] is None
        else:
            assert abs(r["precision"] - round(exp_prec, 6)) < 1e-9
        if exp_rec is None:
            assert r["recall"] is None
        else:
            assert abs(r["recall"] - round(exp_rec, 6)) < 1e-9
        if not exp_prec or not exp_rec:
            assert r["f1"] is None
        else:
            exp_f1 = 2 * exp_prec * exp_rec / (exp_prec + exp_rec)
            assert abs(r["f1"] - round(exp_f1, 6)) < 1e-6
    assert got[0.0]["recall"] == 1.0
    assert got[1.01]["tp"] == 0 and got[1.01]["precision"] is None
