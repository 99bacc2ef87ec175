"""ColumnMapper (P3): persisted rename maps + sync integration.

Reference: src/core/column_mapper.py:45-112 (persistence), :201-224 +
gemini_redshift_loader.py:574-599 (explicit COPY column-list application).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from s3_redshift_backup_tool_spark.operators.column_mapper import (
    ColumnMapper, apply_column_map, select_list)
from s3_redshift_backup_tool_spark.plans.pipeline import TableConfig
from s3_redshift_backup_tool_spark.plans.sync import sync_table
from s3_redshift_backup_tool_spark.state import LocalJsonBackend, WatermarkStore


def test_mapper_roundtrip_and_validation(tmp_path):
    cm = ColumnMapper(str(tmp_path))
    assert cm.get_mapping("scope:db.t") == {}
    cm.set_mapping("scope:db.t", {"OrderID": "order_id", "Amt": "amount"})
    assert cm.get_mapping("scope:db.t") == {"OrderID": "order_id",
                                            "Amt": "amount"}
    with pytest.raises(ValueError):
        cm.set_mapping("scope:db.t", {"x": "2bad"})   # leading digit
    cm.delete_mapping("scope:db.t")
    assert cm.get_mapping("scope:db.t") == {}


def test_apply_map_renames_and_lowercases(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["ID", "Name", "Amt"])
    out = apply_column_map(df, {"Amt": "amount"})
    assert out.columns == ["id", "name", "amount"]
    assert select_list(df.columns, {"Amt": "amount"}) == ["id", "name", "amount"]


def test_sync_with_column_map_renames_cursor_columns(spark, orders, tmp_path):
    """The rename map may rename the CDC ts/id columns; the watermark
    cursor must still advance using the renamed columns."""
    store = WatermarkStore(LocalJsonBackend(str(tmp_path / "state")))
    tc = TableConfig(table_name="orders", cdc_strategy="hybrid",
                     cdc_timestamp_column="o_orderdate",
                     cdc_id_column="o_orderkey",
                     column_map={"o_orderkey": "order_id",
                                 "o_orderdate": "order_ts",
                                 "o_totalprice": "total_price"})
    target = T.StructType([
        T.StructField("order_id", T.LongType(), False),
        T.StructField("order_ts", T.TimestampType(), True),
        T.StructField("total_price", T.DoubleType(), True),
    ])
    r = sync_table(spark, orders, tc, store,
                   staging_path=str(tmp_path / "stage"),
                   target_path=str(tmp_path / "target"),
                   target_schema=target)
    assert r.rows_extracted == orders.count()
    assert r.verified
    loaded = spark.read.parquet(str(tmp_path / "target"))
    assert set(loaded.columns) >= {"order_id", "order_ts", "total_price"}
    # cursor advanced to the max of the renamed keyset
    doc = store.get("src", "orders", "tgt")
    assert doc["mysql_state"]["last_id"] > 0
    assert doc["mysql_state"]["last_timestamp"] is not None
