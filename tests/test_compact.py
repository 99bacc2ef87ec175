"""Target compaction (latest-record-per-key upsert materialization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.plans.compact import compact_target


def test_compact_keeps_latest_per_key(spark, events, tmp_path):
    tgt = str(tmp_path / "target")
    ev = events.select("user_id", "event_id", "ts", "value").limit(3000)
    n = ev.count()
    # append the same keys twice with bumped timestamps = CDC updates
    ev.write.mode("append").parquet(tgt)
    (ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
       .withColumn("value", F.col("value") + 1000)
       .write.mode("append").parquet(tgt))

    res = compact_target(spark, tgt, key_cols=["event_id"], ts_col="ts",
                         tiebreak_cols=["user_id"])
    assert res.rows_before == 2 * n
    assert res.rows_after == n
    assert res.rows_removed == n

    out = spark.read.parquet(tgt)
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n
    # every surviving row is the updated version
    assert out.filter(F.col("value") < 1000).count() == 0


def test_compact_idempotent(spark, orders, tmp_path):
    tgt = str(tmp_path / "t2")
    orders.limit(500).write.mode("append").parquet(tgt)
    r1 = compact_target(spark, tgt, ["o_orderkey"], "o_orderdate")
    assert r1.rows_removed == 0
    r2 = compact_target(spark, tgt, ["o_orderkey"], "o_orderdate")
    assert r2.rows_before == r2.rows_after == 500
