"""Python UDTF surface (functions/udtfs.py): Arrow-batched lateral row
expansion with tolerant JSON parsing."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.functions.udtfs import register_udtfs


def _kv(spark, payloads):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id int, props string")
    df.createOrReplaceTempView("__kv_in")
    rows = spark.sql("""
        SELECT t.id, j.key, j.value
        FROM __kv_in t, LATERAL json_kv(t.props) j""").collect()
    return [(r["id"], r["key"], r["value"]) for r in rows]


def test_json_kv_types_and_tolerance(spark):
    got = _kv(spark, [
        '{"a": 1, "b": "x"}',          # int + raw string
        '{"n": null, "o": {"z": 2}}',  # null + nested round-trips
        'not json at all',             # malformed -> 0 rows, no failure
        '[1, 2]',                      # non-object -> 0 rows
        None,                          # NULL input -> 0 rows
    ])
    assert (0, "a", "1") in got and (0, "b", "x") in got
    assert (1, "n", None) in got and (1, "o", '{"z": 2}') in got
    assert {i for i, _, _ in got} == {0, 1}


def test_json_kv_registration_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)   # re-register must not raise
