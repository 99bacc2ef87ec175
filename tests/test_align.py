"""Schema alignment + cast suite + schema module tests."""

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_redshift_backup_tool_spark import schema as sc
from s3_redshift_backup_tool_spark.operators import align


def test_align_reorder_add_missing_drop_extra(spark):
    df = spark.createDataFrame([(1, "x", 9.5)], "b int, EXTRA string, a double")
    target = T.StructType([
        T.StructField("a", T.DecimalType(18, 2), True),
        T.StructField("b", T.LongType(), True),
        T.StructField("missing_str", T.StringType(), False),   # NOT NULL
        T.StructField("missing_ts", T.TimestampType(), True),
    ])
    out = align.align_to_schema(df, target)
    assert out.columns == ["a", "b", "missing_str", "missing_ts"]
    row = out.collect()[0]
    assert row["a"] == Decimal("9.50")
    assert row["b"] == 1
    assert row["missing_str"] == ""       # F5: NOT NULL string -> ""
    assert row["missing_ts"] is None
    assert dict(out.dtypes)["a"] == "decimal(18,2)"


def test_null_string_semantics(spark):
    df = spark.createDataFrame(
        [("ok",), ("NaN",), ("None",), ("null",), (None,)], "s string")
    target_nullable = T.StructType([T.StructField("s", T.StringType(), True)])
    got = [r["s"] for r in align.align_to_schema(df, target_nullable).collect()]
    assert got == ["ok", None, None, None, None]   # scrubbed to NULL

    target_notnull = T.StructType([T.StructField("s", T.StringType(), False)])
    got = [r["s"] for r in align.align_to_schema(df, target_notnull).collect()]
    assert got == ["ok", "", "", "", ""]           # NOT NULL -> ""


def test_boolean_coercion(spark):
    df = spark.createDataFrame(
        [("true",), ("1",), ("YES",), ("on",), ("0",), ("no",), (None,)], "b string")
    out = df.select(align.cast_boolean(F.col("b")).alias("b")).collect()
    assert [r["b"] for r in out] == [True, True, True, True, False, False, None]


def test_epoch_roundtrip(spark):
    df = spark.createDataFrame([(1735689600,)], "epoch long")  # 2025-01-01 UTC
    out = df.select(
        align.epoch_to_timestamp(F.col("epoch")).alias("ts")
    ).select(
        align.timestamp_to_epoch(F.col("ts")).alias("back"),
        align.normalize_timestamp_string(F.col("ts")).alias("iso"),
    ).collect()[0]
    assert out["back"] == 1735689600
    assert out["iso"] == "2025-01-01 00:00:00"


def test_column_sanitization_and_rename(spark):
    df = spark.createDataFrame([(1, 2, 3)], "`9col` int, `MixedCase` int, old int")
    target = T.StructType([
        T.StructField("col_9col", T.IntegerType(), True),
        T.StructField("mixedcase", T.IntegerType(), True),
        T.StructField("renamed", T.IntegerType(), True),
    ])
    out = align.align_to_schema(df, target, rename_map={"old": "renamed"})
    assert out.columns == ["col_9col", "mixedcase", "renamed"]
    assert out.collect()[0]["renamed"] == 3


def test_mysql_type_mapping():
    assert sc.map_mysql_type("decimal", numeric_precision=38, numeric_scale=10) == \
        T.DecimalType(18, 10)                                   # capped at 18
    assert sc.map_mysql_type("decimal") == T.DecimalType(15, 4) # default
    assert sc.map_mysql_type("bigint", "bigint(20) unsigned") == T.LongType()
    assert sc.map_mysql_type("tinyint", "tinyint(1)") == T.BooleanType()
    assert sc.map_mysql_type("tinyint", "tinyint(3)") == T.ShortType()
    assert sc.map_mysql_type("json") == T.StringType()
    assert sc.map_mysql_type("blob") == T.BinaryType()
    assert sc.map_mysql_type("datetime") == T.TimestampType()
    assert sc.map_mysql_type("time") == T.StringType()
    assert sc.map_mysql_type("whatever_unknown") == T.StringType()


def test_sanitize_names():
    assert sc.sanitize_column_name("MixedCase") == "mixedcase"
    assert sc.sanitize_column_name("9col") == "col_9col"
    assert sc.sanitize_column_name("a b-c") == "a_b_c"
    assert sc.sanitize_table_name("scope:a.b") == "scope_a_b"
    assert sc.parse_scoped_table("us_dw:settlement.orders") == \
        ("us_dw", "settlement", "orders")


def test_ddl_generation():
    schema = T.StructType([
        T.StructField("ID", T.LongType(), False),
        T.StructField("total_fee", T.DecimalType(15, 4), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("update_at", T.TimestampType(), True),
    ])
    ddl = sc.generate_ddl("settlement.orders", schema,
                          keys=sc.TableKeys(dist_key="id", sort_keys=["update_at"]),
                          string_lengths={"name": 255})
    assert "id BIGINT NOT NULL" in ddl
    assert "total_fee DECIMAL(15,4)" in ddl
    assert "name VARCHAR(510)" in ddl       # 2x safety buffer
    assert "DISTKEY(id)" in ddl
    assert "SORTKEY(update_at)" in ddl


def test_ddl_key_overrides_and_auto_fallback(tmp_path):
    """Reference redshift_keys.json semantics (flexible_schema_manager.py
    :340-461, :475-492): per-table overrides validated against the schema;
    missing file / missing columns fall back to AUTO."""
    import json
    schema = T.StructType([
        T.StructField("tracking_number", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("billing_num", T.StringType(), True),
    ])

    keys_file = tmp_path / "redshift_keys.json"
    keys_file.write_text(json.dumps({
        "settlement.settle_orders": {
            "distkey": "tracking_number",
            "sortkey": ["tracking_number", "created_at"]},
        "settlement.other": {"diststyle": "EVEN", "sortkey": "AUTO"},
        "settlement.inter": {
            "interleaved_sortkey": ["billing_num", "created_at"]},
    }))
    keys = sc.load_table_keys(str(keys_file))

    ddl = sc.generate_ddl("settle_orders", schema,
                          keys=keys["settlement.settle_orders"])
    assert "DISTKEY(tracking_number)" in ddl
    assert "COMPOUND SORTKEY(tracking_number, created_at)" in ddl

    ddl2 = sc.generate_ddl("other", schema, keys=keys["settlement.other"])
    assert "DISTSTYLE EVEN" in ddl2 and "SORTKEY AUTO" in ddl2

    ddl3 = sc.generate_ddl("inter", schema, keys=keys["settlement.inter"])
    assert "INTERLEAVED SORTKEY(billing_num, created_at)" in ddl3

    # AUTO defaults: no keys file, or key columns absent from the schema
    assert sc.load_table_keys(str(tmp_path / "missing.json")) == {}
    ddl4 = sc.generate_ddl("t", schema)
    assert "DISTSTYLE AUTO" in ddl4 and "SORTKEY AUTO" in ddl4
    ddl5 = sc.generate_ddl("t", schema,
                           keys=sc.TableKeys(dist_key="not_a_col",
                                             sort_keys=["also_missing"]))
    assert "DISTSTYLE AUTO" in ddl5 and "SORTKEY AUTO" in ddl5


def test_schema_diff():
    old = T.StructType([T.StructField("a", T.IntegerType()),
                        T.StructField("b", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType()),
                        T.StructField("c", T.StringType())])
    d = sc.diff_schemas(old, new)
    assert d == {"added": ["c"], "removed": ["b"], "modified": ["a"]}


def test_schema_cache_ttl():
    clock = [0.0]
    cache = sc.SchemaCache(ttl_seconds=10, clock=lambda: clock[0])
    s = T.StructType([T.StructField("a", T.IntegerType())])
    cache.put("k", s)
    assert cache.get("k") is s
    clock[0] = 11.0
    assert cache.get("k") is None
