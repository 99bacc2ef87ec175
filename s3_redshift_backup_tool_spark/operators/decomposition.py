"""Distributed PCA / whitening over embedding columns.

A training-data pipeline needs dimensionality reduction and whitening
for embedding hygiene (decorrelating features before clustering or
near-dup thresholds, ABX-style drift checks, compressing vectors before
an ANN index). The reference engine has no linear-algebra surface at
all; this module adds one the Spark-first way:

1. **One distributed pass** computes the sufficient statistics
   (n, Σx, ΣxxT) with :func:`second_moment_partials`: an Arrow-batched
   ``mapInPandas`` kernel runs a BLAS ``X.T @ X`` per batch and emits
   ONE partial row per batch — count, sum vector (dim doubles) and
   flattened Gram matrix (dim^2 doubles). The partials relation is
   O(batches), never O(rows).
2. The partials reduce with ``posexplode -> groupBy(pos).sum`` — a
   shuffle of ``batches x (1 + dim + dim^2)`` scalar rows, partially
   aggregated map-side.
3. The reduced moments (1 + dim + dim^2 doubles) come to the driver —
   the same O(k x dim)-class driver transfer as k-means centroids
   (`similarity.kmeans_centroids`) and bloom words — where the dim x dim
   covariance is assembled and (for PCA) eigendecomposed with
   ``numpy.linalg.eigh`` on a matrix whose size is independent of the
   corpus.
4. **Projection and whitening are pure JVM expressions**: each
   component becomes a literal-array dot product
   (``aggregate(zip_with(...))``), so scoring a 100 TB corpus is a
   zero-shuffle map stage inside whole-stage codegen — no Python on
   the hot path.

At 100 TB with dim=1024 the partial row is ~8 MB; with Spark's default
~128 MB input splits that is <7% overhead on the stats pass and the
reduce stays tiny. For dim in the 4k+ range, compute block-columns of
the Gram matrix in separate passes (documented here; not needed for the
reference workloads, whose vectors are <=1k dims).

Determinism: eigenvector signs from ``eigh`` are arbitrary, so
:func:`pca_fit` applies a fixed convention (the largest-|value| element
of every component is made positive, ties to the lowest index) — two
fits of the same data produce identical models.

No analogue in the reference (row-at-a-time ETL, no vector math); cited
for scope: its closest surface is column statistics
(src/core/s3_manager.py metadata summaries).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def second_moment_partials(df: DataFrame, vec_col: str = "embedding",
                           dim: int | None = None) -> DataFrame:
    """Per-Arrow-batch sufficient statistics: (n, sum_vec, gram_flat).

    One output row per batch; ``gram_flat`` is the row-major flattened
    ``X.T @ X`` of the batch. Rows with NULL or wrong-length vectors
    are skipped (counted out of ``n``).
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).filter(
            F.col("d") > 0).first()
        if first is None:
            raise ValueError(f"no non-empty vectors in {vec_col!r}")
        dim = int(first["d"])
    d = dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            vecs = [v for v in pdf[vec_col]
                    if v is not None and len(v) == d]
            if not vecs:
                continue
            x = np.asarray(vecs, dtype="float64")
            yield pd.DataFrame({
                "n": [np.int64(x.shape[0])],
                "s": [(x.sum(axis=0)).tolist()],
                "g": [(x.T @ x).ravel().tolist()],
            })

    return df.select(vec_col).mapInPandas(
        gen, schema="n long, s array<double>, g array<double>")


def _reduce_moments(partials: DataFrame, dim: int) -> tuple[int, list, list]:
    """Reduce partial rows to (n, sum_vec, gram_flat).

    posexplode -> groupBy(pos).sum shuffles only scalar rows (one per
    (batch, position)), partially aggregated map-side; the collected
    relation is exactly 1 + dim + dim^2 rows (driver transfer in the
    documented O(dim^2) allowed class, like k-means centroids)."""
    flat = partials.select(
        F.posexplode(F.concat(F.array(F.col("n").cast("double")),
                              "s", "g")).alias("pos", "val"))
    rows = (flat.groupBy("pos").agg(F.sum("val").alias("val"))
            .collect())
    vals = [0.0] * (1 + dim + dim * dim)
    for r in rows:
        vals[r["pos"]] = r["val"]
    n = int(round(vals[0]))
    return n, vals[1:1 + dim], vals[1 + dim:]


def moments(df: DataFrame, vec_col: str = "embedding",
            dim: int | None = None) -> tuple[int, list[float], list[float]]:
    """Raw sufficient statistics ``(n, sum_vec, gram_flat)`` — the
    MERGEABLE form: two batches' moments add elementwise
    (:func:`merge_moments`), so an incremental sync can keep a running
    covariance without ever rescanning the corpus (the same
    partial-aggregation contract as the KMV/CMS sketches)."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).filter(
            F.col("d") > 0).first()
        if first is None:
            raise ValueError(f"no non-empty vectors in {vec_col!r}")
        dim = int(first["d"])
    return _reduce_moments(second_moment_partials(df, vec_col, dim), dim)


def merge_moments(a: tuple[int, list, list],
                  b: tuple[int, list, list]) -> tuple[int, list, list]:
    """Combine two :func:`moments` results (exact, order-insensitive up
    to float associativity)."""
    na, sa, ga = a
    nb, sb, gb = b
    if len(sa) != len(sb) or len(ga) != len(gb):
        raise ValueError("moment dimensionality mismatch")
    return (na + nb, [x + y for x, y in zip(sa, sb)],
            [x + y for x, y in zip(ga, gb)])


def cov_from_moments(m: tuple[int, list, list], ddof: int = 1
                     ) -> tuple[int, list[float], list[list[float]]]:
    """Finalize ``(n, mean, cov)`` from raw moments."""
    n, s, g = m
    if n <= ddof:
        raise ValueError(f"need more than ddof={ddof} rows, got {n}")
    dim = len(s)
    mean = [si / n for si in s]
    cov = [[(g[i * dim + j] - s[i] * s[j] / n) / (n - ddof)
            for j in range(dim)] for i in range(dim)]
    return n, mean, cov


def covariance_stats(df: DataFrame, vec_col: str = "embedding",
                     dim: int | None = None, ddof: int = 1
                     ) -> tuple[int, list[float], list[list[float]]]:
    """Distributed mean + covariance of a vector column.

    Returns ``(n, mean[dim], cov[dim][dim])`` with ``cov`` the
    ddof-corrected covariance (ddof=1 == SQL ``covar_samp``). One
    linear pass over the data (see module docstring for the plan)."""
    return cov_from_moments(moments(df, vec_col, dim), ddof)


def covariance_by_group(df: DataFrame, group_col: str,
                        vec_col: str = "embedding",
                        dim: int | None = None, ddof: int = 1
                        ) -> dict[str, tuple[int, list, list]]:
    """Per-group mean + covariance: ``{group: (n, mean, cov)}``.

    Same one-pass design as :func:`covariance_stats`, with the batch
    kernel computing partials PER GROUP WITHIN EACH ARROW BATCH
    (pandas groupby + one BLAS matmul per group slice) — the kernel
    never materializes a whole group, so a group larger than executor
    memory is fine; only the per-batch slice is dense. The reduce
    shuffles (groups-per-batch x batches) x (1 + dim + dim^2) scalar
    rows and the driver receives n_groups x dim^2 doubles — intended
    for LOW-CARDINALITY groups (sources, labels, languages). For
    high-cardinality group columns, run dim-blocked passes or drop to
    per-group sketches instead."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).filter(
            F.col("d") > 0).first()
        if first is None:
            raise ValueError(f"no non-empty vectors in {vec_col!r}")
        dim = int(first["d"])
    d = dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ok = pdf[pdf[vec_col].map(
                lambda v: v is not None and len(v) == d)]
            if ok.empty:
                continue
            out = {"g": [], "n": [], "s": [], "gr": []}
            for gval, sub in ok.groupby(group_col, sort=False):
                x = np.asarray(list(sub[vec_col]), dtype="float64")
                out["g"].append(gval)
                out["n"].append(np.int64(x.shape[0]))
                out["s"].append(x.sum(axis=0).tolist())
                out["gr"].append((x.T @ x).ravel().tolist())
            yield pd.DataFrame(out)

    gtype = df.schema[group_col].dataType.simpleString()
    parts = df.select(group_col, vec_col).mapInPandas(
        gen, schema=f"g {gtype}, n long, s array<double>, gr array<double>")
    flat = parts.select(
        "g", F.posexplode(F.concat(F.array(F.col("n").cast("double")),
                                   "s", "gr")).alias("pos", "val"))
    rows = (flat.groupBy("g", "pos").agg(F.sum("val").alias("val"))
            .collect())
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["g"], [0.0] * (1 + d + d * d))[r["pos"]] = r["val"]
    out: dict[str, tuple[int, list, list]] = {}
    for gval, vals in by_group.items():
        n = int(round(vals[0]))
        if n <= ddof:
            continue
        s = vals[1:1 + d]
        g = vals[1 + d:]
        mean = [si / n for si in s]
        cov = [[(g[i * d + j] - s[i] * s[j] / n) / (n - ddof)
                for j in range(d)] for i in range(d)]
        out[gval] = (n, mean, cov)
    return out


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA: row-major components (k x dim), eigenvalues, mean."""
    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]   # k rows, each dim long
    explained_variance: tuple[float, ...]       # top-k eigenvalues
    n: int

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding",
            dim: int | None = None, ddof: int = 1) -> PCAModel:
    """Fit top-k principal components with one distributed pass.

    The eigendecomposition runs on the driver over the dim x dim
    covariance (corpus-size-independent). Deterministic sign
    convention: each component's largest-|value| element (lowest index
    on ties) is made positive."""
    import numpy as np
    n, mean, cov = covariance_stats(df, vec_col, dim, ddof)
    c = np.asarray(cov)
    w, v = np.linalg.eigh((c + c.T) / 2.0)      # symmetrize fp noise
    order = np.argsort(w)[::-1][:k]
    comps, evs = [], []
    for idx in order:
        vec = v[:, idx]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        comps.append(tuple(float(x) for x in vec))
        evs.append(float(max(w[idx], 0.0)))
    return PCAModel(mean=tuple(mean), components=tuple(comps),
                    explained_variance=tuple(evs), n=n)


def _centered_dot(vec_col: str, mean: tuple[float, ...],
                  comp: tuple[float, ...]):
    """JVM-side (x - mean) . comp as a literal-array zip/aggregate —
    whole-stage-codegen'd, zero Python."""
    mean_dot = sum(m * c for m, c in zip(mean, comp))
    comp_lit = F.array(*[F.lit(float(c)) for c in comp])
    raw = F.aggregate(
        F.zip_with(F.col(vec_col), comp_lit,
                   lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    return raw - F.lit(float(mean_dot))


def pca_project(df: DataFrame, model: PCAModel,
                vec_col: str = "embedding",
                prefix: str = "pc") -> DataFrame:
    """Append score columns ``{prefix}0..{prefix}{k-1}`` — a pure map
    stage (no shuffle, no Python)."""
    out = df
    for i, comp in enumerate(model.components):
        out = out.withColumn(f"{prefix}{i}",
                             _centered_dot(vec_col, model.mean, comp))
    return out


def whiten(df: DataFrame, model: PCAModel, vec_col: str = "embedding",
           prefix: str = "w", eps: float = 1e-12) -> DataFrame:
    """PCA-whitened scores: projection / sqrt(eigenvalue). The whitened
    columns have unit (ddof-matching) variance and zero covariance."""
    out = df
    for i, (comp, ev) in enumerate(zip(model.components,
                                       model.explained_variance)):
        scale = 1.0 / math.sqrt(ev + eps)
        out = out.withColumn(
            f"{prefix}{i}",
            _centered_dot(vec_col, model.mean, comp) * F.lit(scale))
    return out


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection — the DATA-BLIND reduction
# (PCA's cheap cousin): no fit pass at all, distance-preserving in
# expectation, the standard pre-step before sketching/LSH when even one
# moments pass over 100 TB is too much.
# ---------------------------------------------------------------------------

def jl_projection_matrix(dim: int, out_dim: int,
                         salt: str = "rp") -> list[list[float]]:
    """Deterministic PORTABLE +-1 projection matrix (Achlioptas'01
    database-friendly JL): sign(j, i) from the parity of the 60-bit md5
    prefix of ``"{salt}:{j}:{i}"`` — the same convention every hash
    gate in this engine uses (``md5_prefix_int``), so an oracle SQL can
    regenerate the identical matrix with
    ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT) % 2``. Signs are
    NOT drawn from a Python PRNG on purpose: PRNG streams are not
    reproducible across engines; md5 is."""
    import hashlib

    mat = []
    for j in range(out_dim):
        row = []
        for i in range(1, dim + 1):
            h = hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:15], 16) % 2 == 0 else -1.0)
        mat.append(row)
    return mat


def random_projection(df: DataFrame, out_dim: int = 16,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id", dim: int | None = None,
                      salt: str = "rp") -> DataFrame:
    """JL projection to ``out_dim`` dims, emitted as SCALAR rows
    (id, dim_index, value) with value = (x . r_j) / sqrt(out_dim),
    rounded to 6 dp for oracle portability.

    Scale shape: the matrix is a literal (out_dim x dim doubles — KBs),
    each output dim one zip_with/aggregate fold — a zero-shuffle map
    stage inside whole-stage codegen, no fit pass, no Python. The
    posexplode multiplies rows by out_dim but each is 3 scalars; for a
    wide-column layout keep the pre-explode projection columns.
    E[|proj(x) - proj(y)|^2] = |x - y|^2 under the 1/sqrt(m) scaling,
    within (1 +- eps) w.h.p. for m ~ 8 ln(n) / eps^2 (JL lemma)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    mat = jl_projection_matrix(dim, out_dim, salt)
    cols = []
    for j, row in enumerate(mat):
        row_lit = F.array(*[F.lit(c) for c in row])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), row_lit,
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)
        cols.append(F.round(proj / F.lit(math.sqrt(float(out_dim))), 6))
    return (df.select(F.col(id_col),
                      F.posexplode(F.array(*cols))
                       .alias("dim_index", "value")))
