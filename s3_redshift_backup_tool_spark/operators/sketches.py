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

from pyspark.sql import DataFrame
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
