"""id_gap_audit: range-bucketed gap detection equals the global-lag
form, including gaps that straddle or swallow partition boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from s3_redshift_backup_tool_spark.operators.quality import id_gap_audit


def _global_gaps(df, id_col):
    w = Window.orderBy("id")
    s = (df.select(F.col(id_col).cast("long").alias("id"))
           .withColumn("prev", F.lag("id").over(w)))
    return (s.filter(F.col("prev").isNotNull()
                     & (F.col("id") - F.col("prev") > 1))
             .select((F.col("prev") + 1).alias("gap_start"),
                     (F.col("id") - 1).alias("gap_end"),
                     (F.col("id") - F.col("prev") - 1).alias("missing")))


def test_gap_audit_equals_global_lag_random_holes(spark):
    # knock out ~20% of a dense sequence pseudo-randomly
    df = (spark.range(0, 20000)
               .filter((F.col("id") * 2654435761) % 10 >= 2)
               .repartition(16))
    got = id_gap_audit(df, "id", num_partitions=8)
    want = _global_gaps(df, "id")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == want.count() > 0


def test_gap_audit_finds_gap_swallowing_whole_partitions(spark):
    # two clusters separated by a huge hole: with 8 range partitions the
    # hole spans several boundaries; the boundary reconciliation must
    # emit it exactly once
    ids = list(range(100, 110)) + list(range(5_000_000, 5_000_010))
    df = spark.createDataFrame([(i,) for i in ids], "id long").repartition(5)
    rows = id_gap_audit(df, "id", num_partitions=8).collect()
    assert {(r["gap_start"], r["gap_end"], r["missing"]) for r in rows} == \
        {(110, 4_999_999, 4_999_890)}


def test_gap_audit_duplicates_are_not_gaps(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (7,)], "id long")
    rows = id_gap_audit(df, "id", num_partitions=4).collect()
    assert {(r["gap_start"], r["gap_end"]) for r in rows} == {(4, 6)}


def test_gap_audit_random_hole_patterns_hypothesis(spark):
    """Property: for ANY sorted id set, bucketed gap audit == the
    closed-form gaps between consecutive ids (holes of any width, at
    partition boundaries or spanning several)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.sets(st.integers(min_value=0, max_value=10_000),
                   min_size=2, max_size=60))
    def run(ids):
        df = spark.createDataFrame([(i,) for i in ids], "id long") \
                  .repartition(5)
        got = {(r["gap_start"], r["gap_end"], r["missing"])
               for r in id_gap_audit(df, "id", num_partitions=7).collect()}
        s = sorted(ids)
        want = {(a + 1, b - 1, b - a - 1)
                for a, b in zip(s, s[1:]) if b - a > 1}
        assert got == want

    run()
