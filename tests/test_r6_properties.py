"""Property tests for the round-6 operators: Morton-key geometry,
PR-curve conservation laws, and the knn-graph contract under random
vector sets — hypothesis drives the inputs, pure-Python references
judge the outputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.layout import (
    bit_interleave, quantize_minmax)


# -- Morton key geometry ----------------------------------------------------

def _morton_py(x: int, y: int) -> int:
    z = 0
    for i in range(32):
        z |= (x >> i & 1) << (2 * i) | (y >> i & 1) << (2 * i + 1)
    return z


@given(pts=st.lists(st.tuples(st.integers(0, 2**31 - 1),
                              st.integers(0, 2**31 - 1)),
                    min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_bit_interleave_property(spark, pts):
    """Spark interleave == reference for arbitrary 31-bit coords, and
    the key is monotone in each coordinate when the other is fixed
    (the property that makes zkey ranges rectangles)."""
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(int(r["x"]), int(r["y"])): int(r["z"])
           for r in df.select("x", "y",
                              bit_interleave(F.col("x"), F.col("y"))
                              .alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == _morton_py(x, y)
    for (x, y) in list(got)[:5]:
        if x + 1 <= 2**31 - 1:
            assert _morton_py(x + 1, y) > got[(x, y)]
        if y + 1 <= 2**31 - 1:
            assert _morton_py(x, y + 1) > got[(x, y)]


@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False),
                     min_size=2, max_size=40),
       bits=st.sampled_from([4, 8, 16]))
@settings(max_examples=10, deadline=None)
def test_quantize_minmax_properties(spark, vals, bits):
    """Quantization stays in [0, 2^bits), is monotone non-decreasing
    in the value, and maps min -> 0 (and max -> 2^bits - 1 when the
    span is non-zero)."""
    mn, mx = min(vals), max(vals)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    q = {float(r["v"]): int(r["q"]) for r in
         df.select("v", quantize_minmax(F.col("v"), F.lit(mn), F.lit(mx),
                                        bits=bits).alias("q")).collect()}
    hi = (1 << bits) - 1
    assert all(0 <= b <= hi for b in q.values())
    ordered = sorted(q.items())
    assert all(a[1] <= b[1] for a, b in zip(ordered, ordered[1:]))
    assert q[mn] == 0
    if mx > mn:
        assert q[mx] == hi


# -- PR-curve conservation --------------------------------------------------

@given(rows=st.lists(st.tuples(st.floats(-4, 4, allow_nan=False),
                               st.floats(-4, 4, allow_nan=False),
                               st.sampled_from([0.0, 1.0])),
                     min_size=5, max_size=60))
@settings(max_examples=6, deadline=None)
def test_pr_curve_conservation(spark, rows):
    """At every threshold: tp+fn == positives, fp+tn == negatives,
    tp+fp+fn+tn == n; and tp is non-increasing as the threshold
    rises (prediction sets shrink monotonically)."""
    from s3_redshift_backup_tool_spark.operators.classifier import (
        logreg_pr_curve)

    df = spark.createDataFrame([(float(a), float(b), float(y))
                                for a, b, y in rows],
                               "x1 double, x2 double, y double")
    n = len(rows)
    pos = sum(1 for r in rows if r[2] == 1.0)
    w = [0.1, 0.8, -0.5]
    ths = (0.2, 0.4, 0.6, 0.8)
    out = sorted((float(r["threshold"]), r) for r in
                 logreg_pr_curve(df, w, ["x1", "x2"], "y",
                                 thresholds=ths).collect())
    assert [t for t, _ in out] == list(ths)
    prev_tp = None
    for _, r in out:
        assert r["tp"] + r["fn"] == pos
        assert r["fp"] + r["tn"] == n - pos
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        if prev_tp is not None:
            assert r["tp"] <= prev_tp
        prev_tp = r["tp"]


# -- knn graph contract -----------------------------------------------------

@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=4, deadline=None)
def test_knn_graph_contract_random_vectors(spark, seed):
    """For random vector sets: ranks per src are dense from 1, at most
    k rows per src, every edge stays within its assigned cell, and
    rank order agrees with (cos desc, dst asc)."""
    import numpy as np

    from s3_redshift_backup_tool_spark.operators import similarity as sim

    rng = np.random.default_rng(seed)
    n, d, k = 60, 8, 3
    vecs = rng.normal(size=(n, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    cents = sim.ivf_centroids(df, n_centroids=4)
    got = sim.knn_graph_within_clusters(df, cents, k=k).collect()

    by_src: dict[int, list] = {}
    for r in got:
        by_src.setdefault(int(r["src"]), []).append(r)
    cell = {int(r["vec_id"]): int(r["centroid_id"])
            for r in sim.ivf_assign(df, cents).collect()}
    for src, rows_ in by_src.items():
        rows_.sort(key=lambda r: r["nn_rank"])
        assert [r["nn_rank"] for r in rows_] == list(
            range(1, len(rows_) + 1))
        assert len(rows_) <= k
        key = [(-float(r["cos_sim"]), int(r["dst"])) for r in rows_]
        assert key == sorted(key)
        for r in rows_:
            assert cell[int(r["dst"])] == cell[src]
