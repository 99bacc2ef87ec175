"""CDC strategy correctness against in-Spark recomputation.

(The DuckDB oracle pass runs via __spark_entry__; these tests pin the
predicate semantics directly, including the keyset tie-break that was the
reference's historical bug surface — SURVEY §7.2.)"""

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators import cdc


WM_TS = "1997-06-01 00:00:00"


def test_hybrid_keyset_tie_break(spark):
    rows = [
        (1, "2026-01-01 00:00:00"),
        (2, "2026-01-02 00:00:00"),
        (3, "2026-01-02 00:00:00"),   # tie on ts with id > last_id
        (4, "2026-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "id long, ts string") \
              .withColumn("ts", F.to_timestamp("ts"))
    cfg = cdc.CDCConfig(strategy="hybrid", timestamp_column="ts", id_column="id")
    wm = cdc.Watermark(last_timestamp="2026-01-02 00:00:00", last_id=2)
    got = sorted(r["id"] for r in cdc.apply_cdc(df, cfg, wm).collect())
    assert got == [3, 4]  # id=2 excluded (already seen), id=3 tie captured


def test_hybrid_fresh_watermark_reads_all(orders):
    cfg = cdc.CDCConfig(strategy="hybrid", timestamp_column="o_orderdate",
                        id_column="o_orderkey")
    assert cdc.apply_cdc(orders, cfg, cdc.Watermark()).count() == orders.count()


def test_hybrid_id_without_timestamp_falls_back_to_id_only(orders):
    # `watermark set --id N` with no --timestamp must not build a NULL
    # predicate that drops every row (ADVICE r1): it degrades to id-only.
    cfg = cdc.CDCConfig(strategy="hybrid", timestamp_column="o_orderdate",
                        id_column="o_orderkey")
    wm = cdc.Watermark(last_timestamp=None, last_id=500)
    got = cdc.apply_cdc(orders, cfg, wm).count()
    want = orders.filter(F.col("o_orderkey") > 500).count()
    assert got == want and got > 0


def test_timestamp_only_matches_manual_filter(orders):
    cfg = cdc.CDCConfig(strategy="timestamp_only", timestamp_column="o_orderdate")
    wm = cdc.Watermark(last_timestamp=WM_TS)
    got = cdc.apply_cdc(orders, cfg, wm).count()
    want = orders.filter(F.col("o_orderdate") > F.lit(WM_TS).cast("timestamp")).count()
    assert got == want and 0 < got < orders.count()


def test_unix_timestamp_auto_detect(spark, events):
    # integer ts column -> watermark string wrapped in unix_timestamp()
    ev = events.withColumn("ts_unix", F.unix_timestamp("ts"))
    cfg = cdc.CDCConfig(strategy="timestamp_only", timestamp_column="ts_unix",
                        timestamp_format="auto")
    wm_str = "2026-01-05 00:00:00"
    got = cdc.apply_cdc(ev, cfg, cdc.Watermark(last_timestamp=wm_str)).count()
    want = ev.filter(F.col("ts") > F.lit(wm_str).cast("timestamp")).count()
    assert got == want


def test_id_only_and_ceiling(events):
    cfg = cdc.CDCConfig(strategy="id_only", id_column="event_id")
    ceiling = cdc.snapshot_ceiling(events, "event_id")
    wm = cdc.Watermark(last_id=100)
    got = cdc.apply_cdc(events, cfg, wm, ceiling=ceiling - 10)
    assert got.agg(F.min("event_id")).collect()[0][0] > 100
    assert got.agg(F.max("event_id")).collect()[0][0] <= ceiling - 10


def test_additional_where_conjunct(orders):
    cfg = cdc.CDCConfig(strategy="id_only", id_column="o_orderkey",
                        additional_where="o_orderstatus = 'F'")
    got = cdc.apply_cdc(orders, cfg, cdc.Watermark(last_id=0))
    assert got.filter(F.col("o_orderstatus") != "F").count() == 0


def test_custom_sql_template(spark, orders):
    cfg = cdc.CDCConfig(
        strategy="custom_sql", id_column="o_orderkey",
        custom_sql=("SELECT o_orderkey, o_totalprice FROM {table_name} "
                    "WHERE o_orderkey > {last_id} LIMIT {limit}"))
    out = cdc.custom_sql_scan(spark, orders, cfg, cdc.Watermark(last_id=500),
                              table_name="orders_cs", limit=10_000)
    assert out.columns == ["o_orderkey", "o_totalprice"]
    assert out.agg(F.min("o_orderkey")).collect()[0][0] > 500


def test_custom_sql_validation_blocks_dml():
    with pytest.raises(ValueError):
        cdc.validate_custom_sql("DELETE FROM t")
    with pytest.raises(ValueError):
        cdc.validate_custom_sql("SELECT * FROM t; DROP TABLE t")
    with pytest.raises(ValueError):
        cdc.CDCConfig(strategy="hybrid", timestamp_column="ts; DROP", id_column="id")


def test_extract_watermark_is_max_keyset(orders):
    cfg = cdc.CDCConfig(strategy="hybrid", timestamp_column="o_orderdate",
                        id_column="o_orderkey")
    wm = cdc.extract_watermark(orders, cfg)
    last = (orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
                  .limit(1).collect()[0])
    assert wm.last_id == last["o_orderkey"]
    assert wm.last_timestamp == last["o_orderdate"].strftime("%Y-%m-%d %H:%M:%S")


def test_extract_watermark_empty_batch(spark, orders):
    cfg = cdc.CDCConfig(strategy="hybrid", timestamp_column="o_orderdate",
                        id_column="o_orderkey")
    wm = cdc.extract_watermark(orders.filter(F.lit(False)), cfg)
    assert wm.last_timestamp is None and wm.last_id is None


def test_time_window_exclusive_start_inclusive_end(spark):
    df = spark.createDataFrame(
        [(i, f"2026-01-0{i} 00:00:00") for i in range(1, 6)],
        "id long, ts string").withColumn("ts", F.to_timestamp("ts"))
    pred = cdc.time_window_predicate("ts", "2026-01-02 00:00:00", "2026-01-04 00:00:00")
    got = sorted(r["id"] for r in df.filter(pred).collect())
    assert got == [3, 4]  # start exclusive, end inclusive (base.py:450)


def test_density_probe(events):
    stats = cdc.density_stats(events, "ts").collect()[0]
    assert stats["mean_rate"] > 0
    assert stats["cv"] is not None


def test_predicate_pushdown_reaches_scan(orders):
    """The CDC filter must appear in PushedFilters on the parquet scan."""
    cfg = cdc.CDCConfig(strategy="id_only", id_column="o_orderkey")
    plan = cdc.apply_cdc(orders, cfg, cdc.Watermark(last_id=1000)) \
              ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(o_orderkey,1000)" in plan
