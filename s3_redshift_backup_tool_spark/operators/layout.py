"""Write-side file layout for scan pruning: z-order clustering.

At 100 TB the cheapest scan is the one that never happens: parquet keeps
min/max statistics per file and row group, and the reader skips units
whose [min, max] range cannot satisfy the filter. A single-column sort
makes skipping perfect on that column and useless on every other; a
z-order (Morton) key interleaves the bits of several columns so files
stay simultaneously range-clustered on all of them — the standard
multi-dimensional clustering trick (Delta OPTIMIZE ZORDER BY, Iceberg
sort orders) built here from plain column expressions.

Shape: one 1-row min/max aggregate per clustering column set (driver
scalar, not a data collect), then a per-row bit-interleave expression,
then ``repartitionByRange`` on the key (even file sizes via range
partitioning) + ``sortWithinPartitions`` so row groups inside each file
are clustered too. Everything stays JVM-side codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of k non-negative int columns, ``bits`` bits
    each: bit j of column i lands at output position j*k + i. Output fits
    in a long for k*bits <= 63."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = c.cast("long")
        for j in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)),
                            j * k + i))
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-order key over ``cols``: each column min/max-normalized into
    [0, 2^bits) (one 1-row aggregate — a driver scalar, same cost class
    as the CDC ceiling probe), then bit-interleaved. Null sorts first
    (normalized to 0)."""
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"__mn_{c}"), F.max(v).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    scaled = []
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        v = (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
        scaled.append(F.least(
            F.floor(v / F.lit(span) * F.lit((1 << bits) - 1)).cast("long"),
            F.lit((1 << bits) - 1)))
    return interleave_bits(scaled, bits)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 8, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Cluster + write: range-partition on the z key (even file sizes),
    sort within each partition (row-group-level clustering), drop the key
    before the bytes hit disk. Readers filtering on ANY of ``cols`` skip
    files/row groups whose min/max range misses the predicate."""
    z = zorder_key(df, cols, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))


def file_pruning_stats(path: str, col: str, lo, hi) -> dict:
    """Driver-side audit: how many parquet files under ``path`` could be
    skipped for ``col BETWEEN lo AND hi``, judged by footer min/max.
    (The same statistics the Spark reader consults — this makes layout
    quality measurable in tests instead of asserted.)"""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    total = prunable = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cmd = md.row_group(rg).column(ci)
                if cmd.path_in_schema != col or cmd.statistics is None:
                    continue
                st = cmd.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:
            continue
        total += 1
        if fmax < lo or fmin > hi:
            prunable += 1
    return {"files": total, "prunable": prunable}
