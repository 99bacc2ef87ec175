"""Distributed quality-classifier training (logistic regression).

The CCNet/fastText-style pipeline step the corpus-curation stack needs
between heuristic rules and LM scoring: train a small linear classifier
on cheap per-doc surface features, score the whole corpus, filter or
stratify on the probability. The reference has no model training at
all; this is the capability-extension analog of its quality gates
(src/utils/validation.py) with a LEARNED decision boundary.

Spark-first shape — full-batch gradient descent where EVERY iteration
is ONE aggregation pass over the corpus:

- the gradient of the logistic loss is ``avg((sigmoid(w.x) - y) * x)``
  per coordinate — a sum of per-row terms, so it partial-aggregates
  map-side and shuffles d+1 doubles per partition, nothing else;
- weights live on the driver (d+1 floats) and re-enter each pass as
  LITERALS folded into codegen — no broadcast variable, no UDF, no
  Python in the hot path;
- scoring is a narrow projection (one sigmoid per row).

At 100 TB each iteration costs exactly one corpus scan (the same scan
any quality rule pays); 5-10 iterations of full-batch GD on a handful
of features is the regime where this beats per-executor SGD — no
reconciliation, deterministic, and the oracle can replay it exactly
(the unrolled-iteration SQL twin in parity_ext).  For many features or
many epochs, sample the corpus for training (hash gate) and keep the
full-corpus pass for scoring only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(weights: list[float], feats: list[Column]) -> Column:
    """w.x + b as a literal-folded codegen expression (bias first).
    Lengths must agree exactly — a silent zip-truncation would score
    the corpus on a partial dot product."""
    if len(weights) != len(feats) + 1:
        raise ValueError(
            f"weights must be [bias, w1..wd]: got {len(weights)} weights "
            f"for {len(feats)} features")
    z: Column = F.lit(float(weights[0]))
    for w, x in zip(weights[1:], feats):
        z = z + F.lit(float(w)) * x
    return z


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(df: DataFrame, feature_cols: list[str | Column],
                 label_col: str | Column, iters: int = 5,
                 lr: float = 1.0, l2: float = 0.0) -> list[float]:
    """Full-batch GD for logistic regression; returns weights
    ``[bias, w1..wd]``. One aggregation job per iteration; the driver
    holds d+1 floats. ``l2`` (if set) is applied to the non-bias
    weights. Deterministic given the input (floating-point sum order
    varies across runs/partitionings only at the ulp level)."""
    feats = [F.col(c) if isinstance(c, str) else c for c in feature_cols]
    feats = [f.cast("double") for f in feats]
    y = (F.col(label_col) if isinstance(label_col, str) else label_col) \
        .cast("double")
    d = len(feats)
    w = [0.0] * (d + 1)
    for _ in range(iters):
        err = _sigmoid(_z(w, feats)) - y
        aggs = [F.avg(err).alias("g0")]
        aggs += [F.avg(err * x).alias(f"g{j + 1}")
                 for j, x in enumerate(feats)]
        row = df.agg(*aggs).first()
        grad = [float(row[f"g{j}"]) for j in range(d + 1)]
        if l2:
            grad = [grad[0]] + [g + l2 * wj
                                for g, wj in zip(grad[1:], w[1:])]
        w = [wj - lr * g for wj, g in zip(w, grad)]
    return w


def surface_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard cheap surface features (f1 = log length,
    f2 = space ratio, f3 = digit ratio) — the default feature set for
    the quality classifier when no task-specific features are given.
    Pure codegen projections; empty text yields NULL features (log of
    0 / division by 0), which a downstream score comparison drops —
    the conventional fate of empty docs in a quality gate."""
    ln = F.length(text_col)
    return df.withColumns({
        "f1": F.log(ln.cast("double")),
        "f2": ((ln - F.length(F.regexp_replace(text_col, " ", ""))) / ln),
        "f3": (F.length(F.regexp_replace(text_col, "[^0-9]", "")) / ln),
    })


def logreg_score(df: DataFrame, weights: list[float],
                 feature_cols: list[str | Column],
                 out_col: str = "p_quality") -> DataFrame:
    """Corpus scoring pass: adds ``sigmoid(w.x + b)`` — a narrow
    codegen projection, zero shuffle."""
    feats = [(F.col(c) if isinstance(c, str) else c).cast("double")
             for c in feature_cols]
    return df.withColumn(out_col, _sigmoid(_z(weights, feats)))


def logreg_metrics(df: DataFrame, weights: list[float],
                   feature_cols: list[str | Column],
                   label_col: str | Column,
                   threshold: float = 0.5) -> DataFrame:
    """One-pass evaluation: accuracy + mean log-loss at ``threshold``.
    Partial-aggregable like the gradient."""
    feats = [(F.col(c) if isinstance(c, str) else c).cast("double")
             for c in feature_cols]
    y = (F.col(label_col) if isinstance(label_col, str) else label_col) \
        .cast("double")
    p = _sigmoid(_z(weights, feats))
    eps = F.lit(1e-12)
    ll = -(y * F.log(p + eps) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + eps))
    hit = (p >= F.lit(threshold)).cast("double") == y
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(hit.cast("double")), 6).alias("accuracy"),
        F.round(F.avg(ll), 6).alias("mean_logloss"))


def logreg_pr_curve(df: DataFrame, weights: list[float],
                    feature_cols: list[str | Column],
                    label_col: str | Column,
                    thresholds: tuple[float, ...] = (
                        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
                    ) -> DataFrame:
    """Decision-threshold calibration sweep: precision / recall / F1
    (plus the raw confusion counts) at each candidate threshold, in ONE
    corpus pass — the step that turns a trained quality classifier into
    a production keep/drop gate (you pick the threshold off this curve,
    e.g. 'highest recall at precision >= 0.9').

    Scale shape: the per-row score is the same literal-folded sigmoid
    as scoring; each row explodes against the |T|-element threshold
    literal and the confusion counts partial-aggregate map-side, so the
    shuffle carries |T| x partitions count tuples — independent of
    corpus size. Precision/recall guard their zero denominators to
    NULL (ANSI-safe), F1 inherits NULL from either."""
    feats = [(F.col(c) if isinstance(c, str) else c).cast("double")
             for c in feature_cols]
    y = (F.col(label_col) if isinstance(label_col, str) else label_col) \
        .cast("double")
    p = _sigmoid(_z(weights, feats))
    ex = (df.select(y.alias("__y"), p.alias("__p"))
            .select("__y", "__p",
                    F.explode(F.lit([float(t) for t in thresholds]))
                     .alias("threshold")))
    pos = F.col("__p") >= F.col("threshold")
    truth = F.col("__y") == 1.0
    cnt = ex.groupBy("threshold").agg(
        F.count(F.when(pos & truth, 1)).alias("tp"),
        F.count(F.when(pos & ~truth, 1)).alias("fp"),
        F.count(F.when(~pos & truth, 1)).alias("fn"),
        F.count(F.when(~pos & ~truth, 1)).alias("tn"))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec))
    return cnt.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def reference_logreg_numpy(X, y, iters: int = 5, lr: float = 1.0,
                           l2: float = 0.0) -> list[float]:
    """Driver-side numpy twin of :func:`logreg_train` (same math, same
    iteration order) — the test oracle that pins the distributed
    aggregation to the textbook algorithm."""
    import numpy as np
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        grad = (p - y) @ Xb / len(y)
        if l2:
            grad[1:] += l2 * w[1:]
        w = w - lr * grad
    return [float(v) for v in w]


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))


def logreg_calibration(df: DataFrame, weights: list[float],
                       feature_cols: list[str | Column],
                       label_col: str | Column,
                       n_bins: int = 10) -> DataFrame:
    """Reliability curve: bucket predicted probability into ``n_bins``
    equal-width bins and compare mean prediction to observed positive
    rate per bin — the calibration diagnostic that tells you whether
    the gate's scores can be READ as probabilities (and whether a
    threshold chosen from the PR curve will transfer to new data).

    One corpus pass: per-row sigmoid on codegen literals, bin id =
    min(floor(p*n_bins), n_bins-1), partial-aggregable counts. The
    per-bin means ride decimal(20,12) per-row casts so the 6dp output
    is partition-order-proof (plain double avgs drift in the last ulp
    across shuffle orders — which is exactly where a round(x, 6)
    boundary can flip)."""
    feats = [(F.col(c) if isinstance(c, str) else c).cast("double")
             for c in feature_cols]
    y = (F.col(label_col) if isinstance(label_col, str) else label_col) \
        .cast("double")
    p = _sigmoid(_z(weights, feats))
    bin_id = F.least(F.floor(p * n_bins), F.lit(n_bins - 1)).cast("int")
    pd_ = p.cast("decimal(20,12)")
    yd = y.cast("decimal(20,12)")
    g = (df.select(bin_id.alias("bin"), pd_.alias("pd"), yd.alias("yd"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("pd").cast("double").alias("sp"),
                F.sum("yd").cast("double").alias("sy")))
    return g.select(
        "bin", "n",
        F.round(F.col("sp") / F.col("n"), 6).alias("mean_pred"),
        F.round(F.col("sy") / F.col("n"), 6).alias("frac_pos"),
        F.round(F.col("sp") / F.col("n") - F.col("sy") / F.col("n"), 6)
         .alias("gap"))
