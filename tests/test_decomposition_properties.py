"""Property-based tests (hypothesis) for the moments algebra behind
distributed covariance/PCA — the invariants that make the streaming and
incremental paths exact:

- merge_moments is commutative and associative (so ANY partition of the
  corpus into batches, folded in ANY order, yields the same state);
- cov_from_moments(merge of per-chunk moments) == numpy covariance of
  the concatenation (the partial-aggregation contract, driver-side
  model of what second_moment_partials + the reduce compute);
- covariance is invariant under row permutation.

Pure-Python/numpy — no SparkSession, so the suite stays fast.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings, strategies as st


def _np_moments(x: np.ndarray):
    return (x.shape[0], x.sum(axis=0).tolist(),
            (x.T @ x).ravel().tolist())


@st.composite
def matrices(draw, min_rows=2, max_rows=24, min_dim=1, max_dim=6):
    n = draw(st.integers(min_rows, max_rows))
    d = draw(st.integers(min_dim, max_dim))
    vals = draw(st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False,
                  width=32),
        min_size=n * d, max_size=n * d))
    return np.asarray(vals, dtype="float64").reshape(n, d)


@settings(max_examples=60, deadline=None)
@given(matrices())
def test_merge_commutative(x):
    from s3_redshift_backup_tool_spark.operators.decomposition import (
        merge_moments)
    a, b = _np_moments(x[: len(x) // 2 + 1]), _np_moments(x[len(x) // 2 + 1:])
    if a[0] == 0 or b[0] == 0:
        return
    ab, ba = merge_moments(a, b), merge_moments(b, a)
    assert ab[0] == ba[0]
    np.testing.assert_allclose(ab[1], ba[1], rtol=1e-12)
    np.testing.assert_allclose(ab[2], ba[2], rtol=1e-12)


def _cancellation_matrix():
    """Hypothesis-discovered falsifying example (r13): one column holds
    {-100, +100, 1.4e-45} — the left fold leaves the float32 denormal
    as a residue, the right fold absorbs it into 100.0 exactly, so the
    two sums differ by ~1e-45 absolute while the true sum is 0."""
    m = np.zeros((10, 5))
    m[1, 2], m[3, 2], m[9, 2] = -100.0, 100.0, 1.40129846e-45
    return m


@settings(max_examples=60, deadline=None)
@given(matrices(min_rows=3), st.integers(1, 5), st.integers(1, 5))
@example(x=_cancellation_matrix(), cut1=1, cut2=2).via("discovered failure")
def test_merge_associative_and_matches_full(x, cut1, cut2):
    from s3_redshift_backup_tool_spark.operators.decomposition import (
        cov_from_moments, merge_moments)
    i = 1 + cut1 % (x.shape[0] - 1)
    j = i + cut2 % (x.shape[0] - i) if i < x.shape[0] else i
    chunks = [c for c in (x[:i], x[i:j], x[j:]) if len(c)]
    ms = [_np_moments(c) for c in chunks]
    left = ms[0]
    for m in ms[1:]:
        left = merge_moments(left, m)
    right = ms[-1]
    for m in reversed(ms[:-1]):
        right = merge_moments(m, right)
    # atol bounds the fold-order residue of catastrophic cancellation:
    # inputs are bounded at 100 and n <= 24, so intermediate partials
    # are <= 2.4e5 and a left-vs-right fold can differ by up to
    # ~n * ulp(2.4e5) ~ 1e-9 absolute when the true sum is ~0 (float
    # addition is not associative); rtol alone makes that an infinite
    # relative error. Same bound as the mean check below.
    np.testing.assert_allclose(left[1], right[1], rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(left[2], right[2], rtol=1e-12, atol=1e-9)
    n, mean, cov = cov_from_moments(left, ddof=0)
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov),
                               np.cov(x, rowvar=False, ddof=0),
                               rtol=1e-6, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(matrices(min_rows=3), st.randoms(use_true_random=False))
def test_covariance_permutation_invariant(x, rnd):
    from s3_redshift_backup_tool_spark.operators.decomposition import (
        cov_from_moments)
    perm = list(range(x.shape[0]))
    rnd.shuffle(perm)
    _, _, c1 = cov_from_moments(_np_moments(x), ddof=0)
    _, _, c2 = cov_from_moments(_np_moments(x[perm]), ddof=0)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-9, atol=1e-9)
