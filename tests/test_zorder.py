"""Z-order layout (operators/layout.py, 2-column fast path): the Morton key must be
the textbook bit interleave, and — the actual point — files written in
zkey order must let a conjunctive box predicate skip most of them on
parquet footer stats, where a single-column layout cannot."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.layout import (
    bit_interleave, quantize_minmax, zorder_keys)


def _morton_py(x: int, y: int) -> int:
    z = 0
    for i in range(32):
        z |= (x >> i & 1) << (2 * i) | (y >> i & 1) << (2 * i + 1)
    return z


def test_bit_interleave_matches_reference(spark):
    vals = [(0, 0), (1, 0), (0, 1), (1, 1), (65535, 0), (0, 65535),
            (65535, 65535), (12345, 54321), (40000, 1), (2**31 - 1, 7)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = df.select("x", "y",
                    bit_interleave(F.col("x"), F.col("y")).alias("z")) \
            .collect()
    for r in got:
        assert int(r["z"]) == _morton_py(int(r["x"]), int(r["y"])), \
            (r["x"], r["y"])


def test_quantize_edges(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    q = df.select(quantize_minmax(F.col("v"), F.lit(0.0), F.lit(100.0),
                                  bits=16).alias("q")).collect()
    assert [int(r["q"]) for r in q] == [0, 32768, 65535]  # max clamps
    # constant column -> all zero, no division by zero
    c = df.select(quantize_minmax(F.col("v"), F.lit(5.0), F.lit(5.0),
                                  bits=16).alias("q")).collect()
    assert {int(r["q"]) for r in c} == {0}


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    return read_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "value")


def _files_overlapping_box(path: str, x_lo, x_hi, y_lo, y_hi) -> tuple[int, int]:
    """(#files whose user_id AND value footer ranges intersect the box,
    #files total) — the file-skipping decision any stats-pruning reader
    makes, computed straight from the parquet footers."""
    files = sorted(glob.glob(path + "/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)}
        mnx = min(md.row_group(g).column(cols["user_id"]).statistics.min
                  for g in range(md.num_row_groups))
        mxx = max(md.row_group(g).column(cols["user_id"]).statistics.max
                  for g in range(md.num_row_groups))
        mny = min(md.row_group(g).column(cols["value"]).statistics.min
                  for g in range(md.num_row_groups))
        mxy = max(md.row_group(g).column(cols["value"]).statistics.max
                  for g in range(md.num_row_groups))
        if mxx >= x_lo and mnx <= x_hi and mxy >= y_lo and mny <= y_hi:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_box_queries(spark, events, tmp_path):
    """Write the same rows in (a) single-column event_id order and
    (b) zkey order, 16 files each; a box predicate covering ~1/4 of
    each dimension must overlap at most half as many z-ordered files
    as single-column-ordered ones (measured: ~16/16 vs ~4/16)."""
    n_files = 16
    z = zorder_keys(events, "user_id", "value")
    (z.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(str(tmp_path / "byz")))
    (events.repartitionByRange(n_files, "event_id")
           .sortWithinPartitions("event_id")
           .write.mode("overwrite").parquet(str(tmp_path / "byid")))

    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
    vlo, vhi = events.agg(F.min("value"), F.max("value")).first()
    x_lo, x_hi = lo + (hi - lo) * 0.4, lo + (hi - lo) * 0.65
    y_lo, y_hi = vlo + (vhi - vlo) * 0.4, vlo + (vhi - vlo) * 0.65

    z_hit, z_tot = _files_overlapping_box(str(tmp_path / "byz"),
                                          x_lo, x_hi, y_lo, y_hi)
    id_hit, id_tot = _files_overlapping_box(str(tmp_path / "byid"),
                                            x_lo, x_hi, y_lo, y_hi)
    assert z_tot == id_tot == n_files
    # event_id order is uncorrelated with (user_id, value): every file
    # spans ~the full range of both -> nothing prunes
    assert id_hit >= n_files - 2
    assert z_hit * 2 <= id_hit, (z_hit, id_hit)


def _hilbert_py(bits: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_reference_is_a_true_curve():
    """Guard the reference itself: at bits=4 the 256 cells are visited
    exactly once each and consecutive indices are ALWAYS adjacent
    cells (the property Morton lacks)."""
    inv = {}
    for x in range(16):
        for y in range(16):
            inv[_hilbert_py(4, x, y)] = (x, y)
    assert sorted(inv) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_from_quantized_matches_reference(spark):
    from s3_redshift_backup_tool_spark.operators.layout import (
        hilbert_from_quantized)

    import random
    rng = random.Random(11)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16))
           for _ in range(200)] + [(0, 0), (65535, 65535), (0, 65535)]
    df = spark.createDataFrame(pts, "qx long, qy long")
    got = hilbert_from_quantized(df, "qx", "qy", bits=16).collect()
    for r in got:
        assert int(r["hkey"]) == _hilbert_py(16, int(r["qx"]),
                                             int(r["qy"])), \
            (r["qx"], r["qy"])


def test_hilbert_layout_prunes_like_zorder(spark, events, tmp_path):
    """Hilbert must deliver the same class of multi-dim pruning as
    Morton on the box-query harness (both far better than the
    single-column layout measured above)."""
    from s3_redshift_backup_tool_spark.operators.layout import hilbert_keys

    n_files = 16
    h = hilbert_keys(events, "user_id", "value")
    (h.repartitionByRange(n_files, "hkey").sortWithinPartitions("hkey")
      .write.mode("overwrite").parquet(str(tmp_path / "byh")))
    lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
    vlo, vhi = events.agg(F.min("value"), F.max("value")).first()
    x_lo, x_hi = lo + (hi - lo) * 0.4, lo + (hi - lo) * 0.65
    y_lo, y_hi = vlo + (vhi - vlo) * 0.4, vlo + (vhi - vlo) * 0.65
    h_hit, h_tot = _files_overlapping_box(str(tmp_path / "byh"),
                                          x_lo, x_hi, y_lo, y_hi)
    assert h_tot == n_files
    assert h_hit * 2 <= n_files, h_hit
