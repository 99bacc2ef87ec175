"""applyInPandasWithState operators: running totals + first-seen dedup
ledger across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_stream(spark, src_glob, schema, build, name, checkpoint=None,
                out_dir=None):
    stream = spark.readStream.schema(schema).parquet(src_glob)
    if checkpoint:
        # checkpoint reuse => state persists across calls and only new
        # files process; the memory sink can't recover from a checkpoint,
        # so checkpointed runs land in a parquet dir via foreachBatch
        def _sink(batch_df, _epoch):
            batch_df.write.mode("append").parquet(out_dir)

        q = (build(stream).writeStream.foreachBatch(_sink)
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", checkpoint).start())
        q.awaitTermination()
        return spark.read.parquet(out_dir)
    q = (build(stream).writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_running_totals_across_batches(spark, events, tmp_path):
    from s3_redshift_backup_tool_spark.streaming.stateful import (
        running_totals_per_user)
    src = str(tmp_path / "src")
    ev = events.select("user_id", "ts", "value").limit(1000)
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    out = _run_stream(spark, src, schema, running_totals_per_user, "totals1")
    # latest state per user == plain batch aggregation
    latest = (out.groupBy("user_id")
                 .agg(F.max("n_events").alias("n_events")))
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    got = {(r["user_id"], r["n_events"]) for r in latest.collect()}
    assert got == {(r["user_id"], r["n_events"]) for r in want.collect()}

    # second batch arrives: totals are cumulative, not per-batch
    ev2 = events.select("user_id", "ts", "value").limit(2000)
    ev2.write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, schema, running_totals_per_user, "totals2")
    latest2 = {r["user_id"]: r["n_events"]
               for r in out2.groupBy("user_id")
                            .agg(F.max("n_events").alias("n_events")).collect()}
    want2 = {r["user_id"]: r["cnt"]
             for r in spark.read.parquet(src).groupBy("user_id")
                           .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert latest2 == want2


def test_first_seen_dedup_ledger(spark, documents, tmp_path):
    from s3_redshift_backup_tool_spark.streaming.stateful import (
        streaming_first_seen)
    src = str(tmp_path / "src")
    docs = documents.select("doc_id", "text").limit(100)
    docs.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    cp = str(tmp_path / "cp_seen")
    out1_dir = str(tmp_path / "seen_out1")
    out = _run_stream(spark, src, schema,
                      lambda s: streaming_first_seen(s, "doc_id"), "seen1",
                      checkpoint=cp, out_dir=out1_dir)
    rows = out.collect()
    assert len(rows) == 100
    assert all(r["occurrences"] == 1 for r in rows)
    assert all(r["is_new"] for r in rows)

    # same docs re-arrive in the SAME stream (shared checkpoint => state
    # persists, only the new files process): occurrences increment and no
    # key reports as new
    docs.write.mode("append").parquet(src)
    out2_dir = str(tmp_path / "seen_out2")
    out2 = _run_stream(spark, src, schema,
                       lambda s: streaming_first_seen(s, "doc_id"), "seen2",
                       checkpoint=cp, out_dir=out2_dir)
    rows2 = out2.collect()
    assert {r["occurrences"] for r in rows2} == {2}
    assert not any(r["is_new"] for r in rows2)
    assert out2.select("key").distinct().count() == 100
