"""Mergeable sketch operators: count-min frequency estimation.

Capability extension beyond the reference: at 100 TB an exact
token-frequency table shuffles O(vocabulary) rows (web-scale corpora
have billions of distinct tokens); a count-min sketch (Cormode &
Muthukrishnan 2005) bounds the state at ``depth x width`` counters
regardless of corpus size, with one-sided error (never undercounts,
overcounts by at most eps*N with probability 1-delta for
width=e/eps, depth=ln(1/delta)).

Spark shape: the sketch IS a DataFrame of (d, bucket, count) — the
groupBy partial-aggregates map-side to at most depth*width rows per
partition before the exchange, so the shuffle carries O(partitions x
depth x width) rows, not O(tokens). Sketches from different corpus
slices merge by unioning and re-summing (counter-wise add), which is
how incremental maintenance works: sketch the delta, merge.

Hashes are md5-prefix int64 (portable: the DuckDB oracle reproduces
every bucket, hence every estimate, exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MERSENNE61, minhash_params
from .text import md5_prefix_int, tokens

#: affine coefficients for the depth hash rows (Carter-Wegman family over
#: the 30-bit halves of ONE md5 base hash — one real digest per token +
#: depth cheap mixes instead of depth md5 passes; same construction and
#: overflow-safety argument as the MinHash family in operators/dedup.py)
CMS_SEED = 7


def _bucket_rows(base: DataFrame, depth: int, width: int) -> DataFrame:
    """(other cols..., d, bucket) rows from a relation carrying a base
    hash column ``__h``: explode a depth-index sequence and pick the
    affine coefficients per row via ``element_at`` on literal arrays.

    NOT ``explode(array(struct(d, bucket_d)))``: the optimizer inlines a
    generator's input expression into the Generate node, duplicating the
    md5 child into every struct element (depth copies per row — the same
    regression minhash_signatures documents and pins; observed 16 md5
    references in the optimized CMS plan before this rewrite)."""
    params = minhash_params(depth, seed=CMS_SEED)
    a = F.element_at(F.array(*[F.lit(p[0]) for p in params]), F.col("d") + 1)
    b = F.element_at(F.array(*[F.lit(p[1]) for p in params]), F.col("d") + 1)
    c = F.element_at(F.array(*[F.lit(p[2]) for p in params]), F.col("d") + 1)
    h = F.col("__h")
    lo = h.bitwiseAND(F.lit((1 << 30) - 1))
    hi = F.shiftright(h, 30)
    bucket = ((a * lo + b * hi + c) % F.lit(MERSENNE61)) % width
    rows = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
    return rows.withColumn("bucket", bucket).drop("__h")


def cms_sketch(df: DataFrame, text_col: str = "text",
               depth: int = 4, width: int = 512) -> DataFrame:
    """Build a count-min sketch over whitespace tokens of ``text_col``.

    Returns (d, bucket, c) with at most ``depth*width`` rows. One
    explode to tokens, one per-row transform to depth (d, bucket)
    pairs, one partial-aggregable groupBy."""
    term = F.explode(tokens(F.col(text_col))).alias("term")
    base = (df.select(term)
              .select(md5_prefix_int(F.col("term")).alias("__h")))
    return (_bucket_rows(base, depth, width)
              .groupBy("d", "bucket")
              .agg(F.count(F.lit(1)).alias("c")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, salt family):
    counter-wise sum. Enables incremental maintenance (sketch the
    delta, merge) and tree-reduction across corpus shards."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(sketch: DataFrame, terms: list[str],
                 depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate token frequencies for ``terms``:
    ``min over d of sketch[d][bucket_d(term)]`` (0 for empty buckets).

    The candidate relation is |terms| x depth rows — broadcast side of
    the join against the (<= depth*width)-row sketch; nothing scales
    with the corpus."""
    spark = sketch.sparkSession
    cand = spark.createDataFrame([(t,) for t in terms], ["term"])
    cb = _bucket_rows(
        cand.select("term", md5_prefix_int(F.col("term")).alias("__h")),
        depth, width).select("term", "d", "bucket")
    return (cb.join(sketch, ["d", "bucket"], "left")
              .fillna(0, ["c"])
              .groupBy("term")
              .agg(F.min("c").alias("cms_count")))


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# --------------------------------------------------------------------------

#: hash space for md5_prefix_int (60 bits)
KMV_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, group_cols: list[str], elem_col: str,
               k: int = 16, salt: str = "") -> DataFrame:
    """Per-group KMV sketch (Bar-Yossef et al. '02): the k smallest
    portable hashes of the distinct elements. Mergeable (union hashes,
    keep k smallest) and SQL-expressible, unlike HLL registers.

    Two-stage prune keeps the top-k selection distributed: the first
    rank runs per (group, input-partition) — each window partition is
    bounded by one shuffle partition's share — and only survivors (at
    most partitions*k rows per group) meet the final per-group rank. A
    single per-group window over ALL distinct hashes would serialize a
    hot group's 10^9 distinct values onto one core at 100 TB.

    Output: (group_cols..., kmv_hash, kmv_rank) with kmv_rank 1..k.
    """
    h = md5_prefix_int(F.col(elem_col), salt)
    dist = df.select(*group_cols, h.alias("kmv_hash")).distinct()
    pre = Window.partitionBy(*group_cols, "__p").orderBy("kmv_hash")
    fin = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (dist
            .withColumn("__p", F.spark_partition_id())
            .withColumn("__r", F.row_number().over(pre))
            .where(F.col("__r") <= k)
            .drop("__p", "__r")
            .withColumn("kmv_rank", F.row_number().over(fin))
            .where(F.col("kmv_rank") <= k))


def kmv_merge(k: int, group_cols: list[str], *sketches: DataFrame) -> DataFrame:
    """⊕-combine sketches: union, dedup (the same element may appear in
    several slices), keep the k smallest per group. merge(sketch(A),
    sketch(B)) == sketch(A ∪ B) exactly — KMV's claim to fame."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    u = sketches[0].select(*group_cols, "kmv_hash")
    for s in sketches[1:]:
        u = u.unionByName(s.select(*group_cols, "kmv_hash"))
    w = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (u.distinct()
             .withColumn("kmv_rank", F.row_number().over(w))
             .where(F.col("kmv_rank") <= k))


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int,
                 round_dp: int = 6) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: when the sketch is
    unsaturated (< k hashes) the count is exact; otherwise
    (k-1) / (h_k / 2^60) — the classic unbiased estimator from the kth
    minimum's position in the hash space."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_size"),
        F.max("kmv_hash").alias("kth_hash"))
    est = F.when(
        F.col("kmv_size") < k, F.col("kmv_size").cast("double")
    ).otherwise((F.lit(float(k - 1)))
                / (F.col("kth_hash").cast("double") / F.lit(KMV_SPACE)))
    return agg.select(*group_cols, "kmv_size", "kth_hash",
                      F.round(est, round_dp).alias("kmv_est"))
