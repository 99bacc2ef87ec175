"""Schema evolution end-to-end (SURVEY §1.2): drift detection + mergeSchema
read + alignment, the Spark mapping of flexible_schema_manager.py:667-713
and src/utils/schema_migration.py:31-104."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_redshift_backup_tool_spark.operators.align import align_to_schema
from s3_redshift_backup_tool_spark.schema import diff_schemas


def test_mergeschema_read_plus_diff_plus_align(spark, orders, tmp_path):
    path = str(tmp_path / "evolving")
    v1 = orders.select("o_orderkey", "o_totalprice").limit(100)
    v1.write.mode("append").parquet(path)

    # schema evolves: a column is added, a column's type widens elsewhere
    v2 = (orders.select("o_orderkey", "o_totalprice")
                .withColumn("o_channel", F.lit("web")).limit(50))
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "o_channel"}
    assert merged.count() == 150
    # old files surface the new column as NULL
    assert merged.filter(F.col("o_channel").isNull()).count() == 100

    diff = diff_schemas(v1.schema, merged.schema)
    assert diff["added"] == ["o_channel"]
    assert diff["removed"] == [] and diff["modified"] == []

    # align the merged frame back to the *old* target: extra column drops
    old_target = T.StructType([
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_totalprice", T.DoubleType(), True),
    ])
    back = align_to_schema(merged, old_target)
    assert back.columns == ["o_orderkey", "o_totalprice"]

    # align v1-shaped data to the *new* target: added column arrives NULL
    new_target = merged.schema
    fwd = align_to_schema(v1, new_target)
    assert set(fwd.columns) == set(merged.columns)
    assert fwd.filter(F.col("o_channel").isNull()).count() == 100
