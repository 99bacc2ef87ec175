"""Source readers: JDBC partitioned-scan option building (the reference's
intra-table parallelism, intra_table.py:169-250, as declarative options)
and nanos-timestamp parquet handling."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.sources.readers import (
    TPCH_TABLES, jdbc_partitioned_options, read_table)


def test_jdbc_partitioned_options_shape():
    opts = jdbc_partitioned_options(
        "jdbc:mysql://h:3306/db", "settlement.orders",
        partition_column="id", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64, extra={"sessionInitStatement": "SET NAMES utf8"})
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "64"
    assert opts["pushDownPredicate"] == "true"
    assert opts["fetchsize"] == "10000"
    assert opts["sessionInitStatement"] == "SET NAMES utf8"


def test_all_fixture_tables_readable(spark, sf_dir):
    for t in TPCH_TABLES:
        df = read_table(spark, sf_dir, t)
        assert df.count() > 0, t


def test_nanos_timestamp_column_readable(spark, sf_dir):
    """events.ts is parquet TIMESTAMP(NANOS); read_table must surface it
    as a usable timestamp (plain spark.read.parquet raises)."""
    ev = read_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    assert ev.selectExpr("max(ts)").first()[0] is not None


def test_csv_source_roundtrips_through_sync_shapes(spark, orders, tmp_path):
    """CSV staging: explicit-schema read returns the same rows/types as
    the parquet source (column order and values)."""
    from s3_redshift_backup_tool_spark.sources.readers import read_csv

    path = str(tmp_path / "orders_csv")
    (orders.selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice",
                       "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate",
                       "o_orderpriority")
           .write.option("header", "true").csv(path))
    back = read_csv(spark, path, orders.schema)
    assert back.schema == orders.schema
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in orders.collect()}
    assert a == b


def test_json_source_roundtrips(spark, orders, tmp_path):
    from s3_redshift_backup_tool_spark.sources.readers import read_json_lines

    path = str(tmp_path / "orders_json")
    orders.write.json(path)
    back = read_json_lines(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orders.collect()}


def test_csv_failfast_rejects_malformed(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T
    from py4j.protocol import Py4JJavaError
    from s3_redshift_backup_tool_spark.sources.readers import read_csv

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("a,b\n1,x\nnot_an_int,y\n")
    schema = T.StructType([T.StructField("a", T.LongType()),
                           T.StructField("b", T.StringType())])
    with pytest.raises(Exception):
        read_csv(spark, str(p), schema).collect()


# -- quarantine reader ------------------------------------------------------

def test_read_with_quarantine_routes_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T
    from s3_redshift_backup_tool_spark.sources.readers import (
        read_with_quarantine,
    )
    src = tmp_path / "in.jsonl"
    src.write_text('\n'.join([
        '{"id": 1, "v": "a"}',
        'THIS IS NOT JSON',
        '{"id": 2, "v": "b"}',
        '{"id": broken}',
    ]) + '\n')
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    q = str(tmp_path / "quarantine")
    clean, n_bad = read_with_quarantine(spark, str(src), schema, q)
    assert n_bad == 2
    assert sorted((r["id"], r["v"]) for r in clean.collect()) == \
        [(1, "a"), (2, "b")]
    # raw lines preserved for forensics
    kept = {r["_corrupt_record"] for r in spark.read.parquet(q).collect()}
    assert "THIS IS NOT JSON" in kept and '{"id": broken}' in kept


def test_read_with_quarantine_clean_input_writes_nothing(spark, tmp_path):
    import os
    from pyspark.sql import types as T
    from s3_redshift_backup_tool_spark.sources.readers import (
        read_with_quarantine,
    )
    src = tmp_path / "in.jsonl"
    src.write_text('{"id": 1, "v": "a"}\n')
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    q = str(tmp_path / "quarantine")
    clean, n_bad = read_with_quarantine(spark, str(src), schema, q)
    assert n_bad == 0 and clean.count() == 1
    assert not os.path.exists(q)       # no empty quarantine artifacts


def test_read_with_quarantine_releases_source_cache(spark, tmp_path):
    """checkpoint_clean=True must not pin the source cache for the life
    of the returned DataFrame: a long-lived driver looping over many
    inputs would accumulate cached partitions until storage OOMs. After
    the call, no RDD from this read stays in the cache manager, and the
    clean slice is still fully usable (checkpoint-backed). The DEFAULT
    (False) keeps the lazily-cached slice — localCheckpoint blocks are
    non-reliable, so surviving executor loss stays the default."""
    from pyspark.sql import types as T
    from s3_redshift_backup_tool_spark.sources.readers import (
        read_with_quarantine,
    )
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    # The leak lives in the SQL CacheManager: entries there are keyed
    # by logical plan and NEVER GC-cleaned (localCheckpoint blocks, by
    # contrast, are ref-counted and dropped by the ContextCleaner).
    def sql_cache_empty():
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty())

    spark.catalog.clearCache()
    cleans = []
    for i in range(3):
        src = tmp_path / f"in{i}.jsonl"
        src.write_text(f'{{"id": {i}, "v": "a"}}\nNOT JSON\n')
        clean, n_bad = read_with_quarantine(
            spark, str(src), schema, str(tmp_path / f"q{i}"),
            checkpoint_clean=True)
        assert n_bad == 1
        cleans.append(clean)
    assert sql_cache_empty(), "quarantine reads leaked SQL cache entries"
    # checkpoint-backed clean slices still readable after unpersist
    assert [r["id"] for c in cleans for r in c.collect()] == [0, 1, 2]

    # default keeps the recomputable pinned-cache behavior
    src = tmp_path / "in_pin.jsonl"
    src.write_text('{"id": 9, "v": "z"}\nNOT JSON\n')
    clean, _ = read_with_quarantine(
        spark, str(src), schema, str(tmp_path / "q_pin"))
    assert not sql_cache_empty()
    assert clean.count() == 1
    spark.catalog.clearCache()
