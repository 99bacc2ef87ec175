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

from pyspark.sql import Column, DataFrame, Window
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


# -- 2-column oracle-twinned fast path ---------------------------------------
#
# zorder_key above is the general k-column form (driver-scalar stats,
# per-bit unrolled interleave). The pair below is its 2-column sibling
# with two properties the general form lacks: dimension stats stay
# IN-PLAN (broadcast 1-row aggregate, no driver collect) and every step
# is reproducible in external SQL, so the registry query
# zorder_keys_events is hash-checked against a DuckDB twin. The
# magic-mask spread is constant op count per row vs bits*k single-bit
# steps.

_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(c: Column) -> Column:
    """Spread a 32-bit non-negative int's bits into the even positions
    of a 64-bit word (magic-mask doubling, pure JVM bit arithmetic)."""
    for sh, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def bit_interleave(x: Column, y: Column) -> Column:
    """Morton interleave of two pre-quantized non-negative ints
    (< 2^31): x occupies even bits, y odd bits."""
    return _spread_bits(x.cast("bigint")).bitwiseOR(
        F.shiftleft(_spread_bits(y.cast("bigint")), 1))


def quantize_minmax(v: Column, mn: Column, mx: Column,
                    bits: int = 16) -> Column:
    """Min-max quantization to [0, 2^bits): identical-parenthesization
    double math so an external SQL engine reproduces it bit-for-bit;
    a constant column (mx == mn) maps to 0."""
    buckets = float(1 << bits)
    q = F.floor(((v.cast("double") - mn.cast("double"))
                 / (mx.cast("double") - mn.cast("double"))) * F.lit(buckets))
    q = F.least(q, F.lit((1 << bits) - 1)).cast("bigint")
    return F.when(mx.cast("double") == mn.cast("double"),
                  F.lit(0).cast("bigint")).otherwise(q)


def zorder_keys(df: DataFrame, x_col: str, y_col: str,
                bits: int = 16, out_col: str = "zkey") -> DataFrame:
    """Append the Z-order key over two columns, min-max quantized to
    ``bits`` bits each. The dimension stats ride a broadcast 1-row
    aggregate (no driver collect, one extra scan of the two columns);
    the interleave itself is a narrow codegen projection. Write with
    ``repartitionByRange(out_col).sortWithinPartitions(out_col)`` so
    every file covers a small (x, y) rectangle; the layout win is
    pinned by tests/test_zorder.py's footer-stats pruning harness."""
    stats = df.agg(F.min(x_col).alias("__mnx"), F.max(x_col).alias("__mxx"),
                   F.min(y_col).alias("__mny"), F.max(y_col).alias("__mxy"))
    qx = quantize_minmax(F.col(x_col), F.col("__mnx"), F.col("__mxx"), bits)
    qy = quantize_minmax(F.col(y_col), F.col("__mny"), F.col("__mxy"), bits)
    return (df.crossJoin(F.broadcast(stats))
              .withColumn(out_col, bit_interleave(qx, qy))
              .drop("__mnx", "__mxx", "__mny", "__mxy"))


def hilbert_from_quantized(df: DataFrame, qx_col: str, qy_col: str,
                           bits: int = 16,
                           out_col: str = "hkey") -> DataFrame:
    """Hilbert index of two already-quantized coords in [0, 2^bits)
    (the classic per-bit fold: quadrant digit + conditional
    flip-and-swap rotation). Hilbert beats Morton on locality —
    consecutive keys are ALWAYS adjacent cells, no quadrant jumps —
    at the cost of per-bit data-dependent branching.

    Implementation note: the rotation makes each step's (x, y) depend
    conditionally on the previous step's BOTH coords, so the fold is
    staged through named columns (withColumns per bit) — a nested
    single-expression form would duplicate subtrees ~3^bits times.
    16 narrow codegen steps, zero shuffle, drops its scratch columns."""
    hx, hy, hd = "__hx", "__hy", "__hd"
    df = df.withColumns({hx: F.col(qx_col).cast("bigint"),
                         hy: F.col(qy_col).cast("bigint"),
                         hd: F.lit(0).cast("bigint")})
    for i in reversed(range(bits)):
        s = 1 << i
        rx = F.shiftright(F.col(hx), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(hy), i).bitwiseAND(F.lit(1))
        quad = (F.when((rx == 0) & (ry == 0), 0)
                 .when(rx == 0, 1)
                 .when(ry == 0, 3)
                 .otherwise(2))          # (3*rx) XOR ry, branch-free of xor
        df = df.withColumns({
            hd: F.col(hd) + F.lit(s).cast("bigint") * F.lit(s) * quad,
            hx: F.when(ry == 1, F.col(hx))
                 .when(rx == 1, F.lit(s - 1) - F.col(hy))
                 .otherwise(F.col(hy)),
            hy: F.when(ry == 1, F.col(hy))
                 .when(rx == 1, F.lit(s - 1) - F.col(hx))
                 .otherwise(F.col(hx)),
        })
    return df.withColumn(out_col, F.col(hd)).drop(hx, hy, hd)


def hilbert_keys(df: DataFrame, x_col: str, y_col: str,
                 bits: int = 16, out_col: str = "hkey") -> DataFrame:
    """Append the Hilbert layout key over two columns — the
    :func:`zorder_keys` sibling with strictly better locality
    (consecutive key ranges are connected regions, so file boundaries
    cut fewer rectangles). Same in-plan broadcast stats, same
    external-SQL-reproducible quantizer; write exactly like zorder_keys
    (repartitionByRange + sortWithinPartitions on the key)."""
    stats = df.agg(F.min(x_col).alias("__mnx"), F.max(x_col).alias("__mxx"),
                   F.min(y_col).alias("__mny"), F.max(y_col).alias("__mxy"))
    qx = quantize_minmax(F.col(x_col), F.col("__mnx"), F.col("__mxx"), bits)
    qy = quantize_minmax(F.col(y_col), F.col("__mny"), F.col("__mxy"), bits)
    staged = (df.crossJoin(F.broadcast(stats))
                .withColumns({"__qx": qx, "__qy": qy}))
    return (hilbert_from_quantized(staged, "__qx", "__qy", bits, out_col)
            .drop("__qx", "__qy", "__mnx", "__mxx", "__mny", "__mxy"))


# --------------------------------------------------------------------------
# Small-file compaction planning
# --------------------------------------------------------------------------

def compaction_plan(files: DataFrame, part_cols: list[str],
                    size_col: str = "size_bytes",
                    file_col: str = "file_id",
                    target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Assign files to rewrite bins of ~``target_bytes`` each, per table
    partition — the planning half of an OPTIMIZE/compact job.

    The reference leaves whatever file sizes its chunked uploads produce
    (src/core/s3_manager.py partitioned staging); at 100 TB the resulting
    small-file population is what kills scan throughput (one task + one
    S3 GET per tiny file). This planner is pure metadata work: input is
    one row per FILE (path/id, partition values, byte size) — billions of
    data rows collapse to ~millions of file rows, so the window below is
    over a bounded relation per table partition.

    Strategy: next-fit-decreasing by prefix sum — sort a partition's
    files by (size desc, id), cumulative-sum the sizes, bin =
    floor(exclusive_prefix / target). One pass, deterministic,
    SQL-expressible (it IS the oracle), each bin lands within one file of
    the target. Output: one row per (partition, bin) with file count and
    total bytes; a rewrite job then maps each bin to one output file.
    """
    w = (Window.partitionBy(*part_cols)
               .orderBy(F.desc(size_col), F.col(file_col)))
    prev = F.sum(size_col).over(w) - F.col(size_col)
    binned = files.withColumn(
        "bin_id", F.floor(prev / F.lit(float(target_bytes))).cast("int"))
    return (binned.groupBy(*part_cols, "bin_id")
                  .agg(F.count(F.lit(1)).alias("n_files"),
                       F.sum(size_col).cast("bigint").alias("bin_bytes")))


def files_df_from_dir(spark, path: str, suffix: str = ".parquet") -> DataFrame:
    """Driver-side directory listing -> (file_id, size_bytes) relation for
    :func:`compaction_plan`. Listing is O(n_files) metadata work (on a
    real deployment this comes from the table catalog / FS listing API,
    not a walk); local-FS helper for tests and the CLI."""
    import os
    rows = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(suffix):
                p = os.path.join(root, n)
                rows.append((os.path.relpath(p, path), os.path.getsize(p)))
    return spark.createDataFrame(rows, "file_id string, size_bytes bigint")


def execute_compaction(spark, path: str,
                       target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Execute a compaction: rewrite a parquet directory so each
    partition carries ~target-byte files — the OPTIMIZE half to
    :func:`compaction_plan`'s planning half. Hive-style single-level
    partition dirs (``col=value``) are compacted per partition (a
    bounded driver loop — one small Spark job per partition, which is
    how real OPTIMIZE implementations batch too); flat dirs in one job.

    Crash-safe: each rewritten dir lands aside as ``<dir>__tmpc`` and
    swaps in via rename (stale tmp dirs are cleaned first), so a crash
    leaves either the old or the new complete directory, never a mix.
    The one unguarded instant — between ``rename(d, __oldc)`` and
    ``rename(__tmpc, d)`` — leaves NO live dir, so entry runs
    :func:`_recover_swap` first: a missing live dir with a complete
    ``__tmpc`` (has _SUCCESS) rolls FORWARD, otherwise ``__oldc`` rolls
    BACK. Returns {partition: (files_before, files_after)}."""
    import math
    import os
    import shutil

    def _recover_swap(d: str) -> None:
        tmp, old = d.rstrip("/") + "__tmpc", d.rstrip("/") + "__oldc"
        if os.path.isdir(d):
            # live dir exists => the swap completed (or never started);
            # any surviving __oldc/__tmpc siblings are stale leftovers
            # from a crash between rename(tmp, d) and the final rmtree.
            # They must go NOW: the suffixed dir name still contains
            # 'col=', so a partition-discovery read of the dataset root
            # would otherwise see partition value 'X__oldc' and return a
            # duplicate copy of the old data.
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
            return
        if os.path.isdir(tmp) and os.path.exists(
                os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, d)                # roll forward: new is complete
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            os.rename(old, d)                # roll back: restore original
            shutil.rmtree(tmp, ignore_errors=True)

    def _bins(d: str) -> tuple[int, int]:
        sizes = [os.path.getsize(os.path.join(d, f))
                 for f in os.listdir(d)
                 if f.endswith(".parquet")]
        total = sum(sizes)
        return len(sizes), max(1, math.ceil(total / target_bytes))

    def _rewrite(d: str, n_files: int) -> None:
        tmp = d.rstrip("/") + "__tmpc"
        shutil.rmtree(tmp, ignore_errors=True)
        df = spark.read.parquet(d)
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        old = d.rstrip("/") + "__oldc"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old, ignore_errors=True)

    # recover any interrupted swap from a prior run before planning:
    # strip the suffix off orphaned __oldc/__tmpc dirs to find the live
    # paths they belong to, then roll each forward or back
    _recover_swap(path)  # flat-dir case: path itself may be mid-swap
    for e in list(os.listdir(path)):
        for suf in ("__oldc", "__tmpc"):
            if e.endswith(suf):
                _recover_swap(os.path.join(path, e[: -len(suf)]))

    parts = [e for e in os.listdir(path)
             if "=" in e and not e.endswith(("__oldc", "__tmpc"))
             and os.path.isdir(os.path.join(path, e))]
    report = {}
    if parts:
        for e in sorted(parts):
            d = os.path.join(path, e)
            before, n = _bins(d)
            if n < before:
                _rewrite(d, n)
            report[e] = (before, min(before, n))
    else:
        before, n = _bins(path)
        if n < before:
            _rewrite(path, n)
        report["."] = (before, min(before, n))
    return report
