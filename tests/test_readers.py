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
