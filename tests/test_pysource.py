"""Custom Python Data Source (cdc_feed): partitioned parallel reads,
id-range filter pushdown, determinism, CDC-operator composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.sources.pysource import (
    CDCFeedDataSource, CDCFeedReader, feed_row)


def _feed(spark, **opts):
    spark.dataSource.register(CDCFeedDataSource)
    r = spark.read.format("cdc_feed")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_feed_count_partitions_and_rows(spark):
    df = _feed(spark, end=1000)
    assert df.count() == 1000
    assert df.select(F.spark_partition_id()).distinct().count() == 8
    got = df.filter("id = 123").first()
    assert tuple(got) == feed_row(123)
    # determinism: two reads agree
    a = sorted(tuple(r) for r in df.filter("id < 50").collect())
    b = sorted(tuple(r) for r in _feed(spark, end=1000)
               .filter("id < 50").collect())
    assert a == b


def test_feed_filter_pushdown_narrows_partitions():
    """Unit-level: the watermark predicate must shrink the GENERATED
    range, not just filter rows after the fact."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

    r = CDCFeedReader({"end": "1000", "numPartitions": "4"})
    rest = list(r.pushFilters([GreaterThan(("id",), 899),
                               LessThan(("id",), 950),
                               GreaterThan(("value",), 1.0)]))
    # the non-id filter comes back to Spark; the id range is absorbed
    assert len(rest) == 1 and rest[0].attribute == ("value",)
    parts = r.partitions()
    assert min(p.lo for p in parts) == 900
    assert max(p.hi for p in parts) == 950

    r2 = CDCFeedReader({"end": "1000"})
    assert list(r2.pushFilters([EqualTo(("id",), 7)])) == []
    parts = r2.partitions()
    assert len(parts) == 1 and (parts[0].lo, parts[0].hi) == (7, 8)


def test_feed_pushdown_end_to_end(spark):
    df = _feed(spark, end=10_000)
    assert df.filter("id >= 9900").count() == 100
    assert df.filter("id > 9899 and id <= 9949").count() == 50
    assert df.filter("id = 42").first()["op"] == "I"


def test_feed_composes_with_cdc_operators(spark):
    """The id_only watermark predicate from operators/cdc.py prunes at
    the SOURCE (pushFilters), then op/value semantics hold."""
    from s3_redshift_backup_tool_spark.operators.cdc import (
        CDCConfig, Watermark, apply_cdc)

    df = _feed(spark, end=2000)
    cfg = CDCConfig(strategy="id_only", id_column="id")
    delta = apply_cdc(df, cfg, Watermark(last_id=1499))
    assert delta.count() == 500
    ops = {r["op"]: r["n"] for r in
           delta.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ops == {"I": 400, "U": 50, "D": 50}      # 80/10/10 cycle


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """The Python writer's task temps become visible only after the
    driver commit (rename + _SUCCESS), and content round-trips."""
    import json
    import os

    from s3_redshift_backup_tool_spark.sources.pysource import (
        JsonLinesSinkDataSource)

    spark.dataSource.register(JsonLinesSinkDataSource)
    out = str(tmp_path / "sink")
    df = _feed(spark, end=100).repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not [n for n in names if n.startswith("_tmp_")]
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 4
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as fh:
            rows += [json.loads(l) for l in fh]
    assert len(rows) == 100
    assert int(open(os.path.join(out, "_SUCCESS")).read()) == 100
    by_id = {r["id"]: r for r in rows}
    assert by_id[3]["op"] == "I" and by_id[9]["op"] == "D"

    # append accumulates; overwrite is an explicit NotImplementedError
    df.limit(10).write.format("jsonl_sink").option("path", out) \
      .mode("append").save()
    import pytest as _pytest
    with _pytest.raises(Exception, match="append-only"):
        df.write.format("jsonl_sink").option("path", out) \
          .mode("overwrite").save()
