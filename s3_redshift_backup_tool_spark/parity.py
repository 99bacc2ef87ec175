"""Parity query registry: every SURVEY §2 operator as a (Spark, DuckDB-SQL)
pair for the driver's correctness gate.

Each entry couples a DataFrame program with the ANSI-SQL statement DuckDB
runs on the same parquet tables; the driver compares row-count + schema +
order-insensitive value hash. Conventions that keep the hash stable:

- every computed column is aliased identically on both sides;
- float aggregations go through an exact decimal cast then back to double
  (``SUM(CAST(x AS DECIMAL(18,2)))`` -> ``DOUBLE``), so the sum is
  order-independent — plain double sums differ in the last ulp between
  engines/partitionings;
- non-exact statistics (stddev, ratios) are rounded to 6 dp on both sides;
- session timezone is pinned UTC before reading.

Reference citations are on each entry; the Spark side goes through the
engine's own operator modules wherever one exists (this is the operator
inventory exercised end-to-end, not a parallel implementation).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators import cdc as cdc_ops
from .operators.align import align_to_schema
from .operators.cdc import CDCConfig, Watermark
from .operators.manifest import exclude_processed, union_dedup
from .operators.quality import duplicate_row_count, quality_aggregates
from .sources.readers import read_table

# --------------------------------------------------------------------------
# Shared watermark / bound constants (mid-range for sf0.01; used verbatim in
# both the DataFrame programs and the oracle SQL)
# --------------------------------------------------------------------------
ORDERS_WM_ID = 7500
LINEITEM_WM_TS = "1998-06-15 00:00:00"
LINEITEM_WM_ID = 30000
EVENTS_WM_TS = "2024-01-20 00:00:00"
EVENTS_WM_UNIX = 1705708800          # epoch seconds of EVENTS_WM_TS (UTC)
EVENTS_WM_ID = 5000
EVENTS_CEILING = 9000
WINDOW_START = "2024-01-10 00:00:00"
WINDOW_END = "2024-01-20 00:00:00"


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None -> driver runs rows-only check
    doc: str = ""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            # a silent dict overwrite shadowed two earlier-round entries
            # in round 7 (funnel/cohort) — fail loudly instead
            raise RuntimeError(f"duplicate registry entry name: {name!r} "
                               f"(existing: {REGISTRY[name].fn.__module__}."
                               f"{REGISTRY[name].fn.__qualname__})")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


# ==========================================================================
# S1-S6: CDC strategy scans
# ==========================================================================

@q("cdc_hybrid_lineitem_ties",
   f"""SELECT * FROM lineitem
       WHERE (l_shipdate > TIMESTAMP '{LINEITEM_WM_TS}'
          OR (l_shipdate = TIMESTAMP '{LINEITEM_WM_TS}' AND l_orderkey > {LINEITEM_WM_ID}))
         AND l_returnflag = 'R'""",
   "S2 hybrid keyset scan (cdc_strategy_engine.py:366-434) with tie-rich "
   "day-granularity timestamp + P2 additional_where conjunct (:253-259)")
def cdc_hybrid_lineitem_ties(spark, sf_dir):
    cfg = CDCConfig(strategy="hybrid", timestamp_column="l_shipdate",
                    id_column="l_orderkey",
                    additional_where="l_returnflag = 'R'")
    wm = Watermark(last_timestamp=LINEITEM_WM_TS, last_id=LINEITEM_WM_ID)
    return cdc_ops.apply_cdc(_t(spark, sf_dir, "lineitem"), cfg, wm)


@q("cdc_timestamp_only_events",
   f"""SELECT event_id, ts, epoch_us(ts) // 1000000 AS ts_unix, event_type
       FROM events WHERE ts > TIMESTAMP '{EVENTS_WM_TS}'
         AND epoch_us(ts) // 1000000 > {EVENTS_WM_UNIX}""",
   "S1 timestamp_only scan (cdc_strategy_engine.py:188-294) applied twice: "
   "plain timestamp predicate, then the UNIX-int auto-detect path "
   "(:228-251) on the derived epoch column — identical row set, both "
   "code paths exercised")
def cdc_timestamp_only_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", F.unix_timestamp("ts").alias("ts_unix"), "event_type")
    plain = CDCConfig(strategy="timestamp_only", timestamp_column="ts")
    step1 = cdc_ops.apply_cdc(ev, plain, Watermark(last_timestamp=EVENTS_WM_TS))
    unix = CDCConfig(strategy="timestamp_only", timestamp_column="ts_unix",
                     timestamp_format="auto")  # int column -> epoch compare
    return cdc_ops.apply_cdc(step1, unix, Watermark(last_timestamp=EVENTS_WM_TS))


@q("cdc_id_only_ceiling_events",
   f"""SELECT * FROM events
       WHERE event_id > {EVENTS_WM_ID} AND event_id <= {EVENTS_CEILING}""",
   "S3 id_only scan + S8 MAX(id) ceiling bound (row_based.py:278-291)")
def cdc_id_only_ceiling_events(spark, sf_dir):
    cfg = CDCConfig(strategy="id_only", id_column="event_id")
    return cdc_ops.apply_cdc(_t(spark, sf_dir, "events"), cfg,
                             Watermark(last_id=EVENTS_WM_ID),
                             ceiling=EVENTS_CEILING)


@q("cdc_full_sync_region",
   "SELECT * FROM region",
   "S4 full_sync replace scan (cdc_strategy_engine.py:607-694)")
def cdc_full_sync_region(spark, sf_dir):
    cfg = CDCConfig(strategy="full_sync", full_sync_mode="replace")
    return cdc_ops.apply_cdc(_t(spark, sf_dir, "region"), cfg, Watermark())


@q("cdc_custom_sql_orders",
   f"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       WHERE o_orderkey > {ORDERS_WM_ID}""",
   "S5 custom_sql template scan (cdc_strategy_engine.py:783-834)")
def cdc_custom_sql_orders(spark, sf_dir):
    cfg = CDCConfig(
        strategy="custom_sql", id_column="o_orderkey",
        custom_sql=("SELECT o_orderkey, o_custkey, o_totalprice "
                    "FROM {table_name} WHERE o_orderkey > {last_id}"))
    return cdc_ops.custom_sql_scan(spark, _t(spark, sf_dir, "orders"), cfg,
                                   Watermark(last_id=ORDERS_WM_ID),
                                   table_name="orders_custom_src")


@q("cdc_time_window_events",
   f"""SELECT * FROM events
       WHERE ts > TIMESTAMP '{WINDOW_START}' AND ts <= TIMESTAMP '{WINDOW_END}'""",
   "S6 bounded window: exclusive start / inclusive end (base.py:428-484)")
def cdc_time_window_events(spark, sf_dir):
    pred = cdc_ops.time_window_predicate("ts", WINDOW_START, WINDOW_END)
    return _t(spark, sf_dir, "events").filter(pred)


# ==========================================================================
# A1-A4: probes & watermark extraction
# ==========================================================================

@q("watermark_extract_orders",
   """SELECT o_orderdate AS wm_ts, o_orderkey AS wm_id,
             (SELECT max(o_orderkey) FROM orders) AS ceiling
      FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""",
   "A4 watermark extraction == max(struct(ts,id)) (cdc_strategy_engine.py:"
   "296-336) + A1/S8 MAX(id) ceiling snapshot (row_based.py:799), one pass")
def watermark_extract_orders(spark, sf_dir):
    m = F.max(F.struct(F.col("o_orderdate").alias("wm_ts"),
                       F.col("o_orderkey").alias("wm_id"))).alias("m")
    return (_t(spark, sf_dir, "orders")
            .agg(m, F.max("o_orderkey").alias("ceiling"))
            .select(F.col("m.wm_ts").alias("wm_ts"),
                    F.col("m.wm_id").alias("wm_id"), "ceiling"))


@q("density_stats_events",
   """WITH h AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS rows_per_hour
                 FROM events GROUP BY 1)
      SELECT round(avg(rows_per_hour), 6) AS mean_rate,
             round(stddev_pop(rows_per_hour), 6) AS stddev_rate,
             round(stddev_pop(rows_per_hour) / avg(rows_per_hour), 6) AS cv,
             CAST(sum(rows_per_hour) AS BIGINT) AS total_rows
      FROM h""",
   "S10 density sampling (one group-by replaces 6 probe queries, "
   "base.py:486-623) + A3 mean/stddev/CV statistics (:625-735) + S9 "
   "row-count probe as the hourly sum (base.py:983-1068)")
def density_stats_events(spark, sf_dir):
    s = cdc_ops.density_stats(_t(spark, sf_dir, "events"), "ts")
    return s.select(F.round("mean_rate", 6).alias("mean_rate"),
                    F.round("stddev_rate", 6).alias("stddev_rate"),
                    F.round("cv", 6).alias("cv"),
                    F.col("total_rows").cast("long").alias("total_rows"))


# ==========================================================================
# P3/P4/F1-F7: projection, alignment, cast suite
# ==========================================================================

@q("align_orders_to_target",
   """SELECT o_orderkey, coalesce(o_orderstatus, '') AS o_orderstatus,
             o_totalprice, o_orderdate,
             CAST(NULL AS VARCHAR) AS load_note
      FROM orders""",
   "P4 schema alignment: reorder, missing->typed null, NOT NULL string (s3_manager.py:705-845)")
def align_orders_to_target(spark, sf_dir):
    target = T.StructType([
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),   # NOT NULL
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("load_note", T.StringType(), True),        # missing -> NULL
    ])
    return align_to_schema(_t(spark, sf_dir, "orders"), target)


@q("cast_suite_lineitem",
   """SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty_quantized,
             CAST(l_linenumber AS SMALLINT) AS linenumber_small,
             (l_linenumber % 2 = 1) AS is_odd_line,
             strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_iso,
             epoch_us(l_shipdate) // 1000000 AS ship_epoch
      FROM lineitem""",
   "F1 decimal quantize / F3 bool / F4 downcast / F6 epoch / F7 ISO normalize")
def cast_suite_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("decimal(18,2)").cast("double").alias("qty_quantized"),
        F.col("l_linenumber").cast("smallint").alias("linenumber_small"),
        ((F.col("l_linenumber") % 2) == 1).alias("is_odd_line"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_iso"),
        F.unix_timestamp("l_shipdate").alias("ship_epoch"),
    )


@q("sanitize_scrub_customer",
   """SELECT c_custkey AS custkey, c_name AS customer_name,
             c_custkey % 10 AS col_9rank,
             CASE WHEN c_custkey % 5 IN (0, 1) THEN ''
                  ELSE c_mktsegment END AS segment
      FROM customer""",
   "F9 name sanitization: lowercase + digit-prefix (flexible_schema_manager"
   ".py:857-874) + F5 null-string semantics: 'none' scrub + NOT NULL -> '' "
   "(s3_manager.py:803-825), one alignment projection")
def sanitize_scrub_customer(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    dirty = (F.when(F.col("c_custkey") % 5 == 0, F.lit("none"))
              .when(F.col("c_custkey") % 5 == 1, F.lit(None))
              .otherwise(F.col("c_mktsegment")))
    cust = (cust.withColumn("9Rank", F.col("c_custkey") % 10)
                .withColumn("Segment", dirty)
                .withColumnRenamed("c_custkey", "CustKey"))
    target = T.StructType([
        T.StructField("custkey", T.LongType(), True),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("col_9rank", T.LongType(), True),
        T.StructField("segment", T.StringType(), False),   # NOT NULL -> ''
    ])
    return align_to_schema(cust, target, rename_map={"c_name": "customer_name"})


# ==========================================================================
# P5/U1/U2: manifest set operations
# ==========================================================================

@q("manifest_anti_join",
   """SELECT u.o_orderkey FROM (
        SELECT o_orderkey FROM orders WHERE o_orderkey < 5000
        UNION
        SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 2500 AND 7500) u
      WHERE NOT EXISTS (SELECT 1 FROM orders p
                        WHERE p.o_orderkey % 3 = 0 AND p.o_orderkey = u.o_orderkey)""",
   "U1 blacklist union with set-dedup (simple_watermark_manager.py:205-208) "
   "feeding the P5/U2 processed-file anti-join "
   "(gemini_redshift_loader.py:499-527) — the full discover-minus-loaded path")
def manifest_anti_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") < 5000).select(
        F.col("o_orderkey").alias("path"))
    b = orders.filter(F.col("o_orderkey").between(2500, 7500)).select(
        F.col("o_orderkey").alias("path"))
    discovered = union_dedup(a, b)
    processed = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("path"))
    return exclude_processed(discovered, processed) \
        .select(F.col("path").alias("o_orderkey"))


# ==========================================================================
# A7-A9: verification & quality aggregates
# ==========================================================================

@q("verify_counts",
   """SELECT (SELECT count(*) FROM orders) AS orders_rows,
             (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS lineitem_orders,
             (SELECT count(*) FROM orders s
              WHERE NOT EXISTS (SELECT 1 FROM orders t
                                WHERE t.o_orderkey % 7 <> 0
                                  AND t.o_orderkey = s.o_orderkey)) AS missing_rows""",
   "A7 row-count verification (gemini_redshift_loader.py:927-958) + "
   "source-vs-target anti-join diff count (SURVEY §2.3: richer than the "
   "reference's count-only check)")
def verify_counts(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    orders_cnt = orders.agg(F.count(F.lit(1)).alias("orders_rows"))
    li = _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_orderkey").alias("lineitem_orders"))
    source = orders.select("o_orderkey")
    target = orders.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey")
    missing = source.join(target, "o_orderkey", "left_anti").agg(
        F.count(F.lit(1)).alias("missing_rows"))
    return orders_cnt.crossJoin(li).crossJoin(missing)


@q("quality_metrics_lineitem",
   """SELECT count(*) AS row_count,
             count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS l_returnflag__nulls,
             count(CASE WHEN l_returnflag = '' THEN 1 END) AS l_returnflag__empty,
             CAST(max(length(l_returnflag)) AS BIGINT) AS l_returnflag__max_len,
             count(CASE WHEN l_quantity IS NULL THEN 1 END) AS l_quantity__nulls,
             count(CASE WHEN isnan(l_quantity) OR l_quantity IN ('inf'::DOUBLE, '-inf'::DOUBLE)
                        THEN 1 END) AS l_quantity__nonfinite,
             (SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT)
              FROM (SELECT count(*) AS cnt FROM lineitem
                    GROUP BY l_returnflag, l_linestatus) g
              WHERE cnt > 1) AS duplicate_rows
      FROM lineitem""",
   "A9 one-pass data-quality aggregates (src/utils/validation.py:138-204) "
   "+ duplicate-row count (validation.py duplicate check)")
def quality_metrics_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dups = duplicate_row_count(_t(spark, sf_dir, "lineitem"),
                               ["l_returnflag", "l_linestatus"])
    return quality_aggregates(li).crossJoin(dups)


# ==========================================================================
# O1-O4 + §2.5 windows: sorts, limits, keyset pagination, latest-record dedup
# ==========================================================================

@q("latest_record_per_user",
   """SELECT user_id, event_id, ts, event_type FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1""",
   "latest-record dedup via row_number window (SURVEY §2.5: CDC-delta compaction)")
def latest_record_per_user(spark, sf_dir):
    from pyspark.sql import Window as W
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("user_id", "event_id", "ts", "event_type"))


@q("keyset_page_orders",
   """SELECT o_orderkey, o_orderdate, rn FROM (
        SELECT o_orderkey, o_orderdate,
               row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t
      WHERE rn BETWEEN 1001 AND 1100""",
   "O1-O3 deterministic keyset pagination as row_number "
   "(cdc_strategy_engine.py:169-173) — ranks come from "
   "assign_global_ids (range exchange + per-partition numbering), not "
   "a global single-partition window, so the SAME page query runs over "
   "any table size; the oracle's global row_number is the small-data "
   "twin")
def keyset_page_orders(spark, sf_dir):
    from .operators.partitioning import assign_global_ids
    ranked = assign_global_ids(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
        ["o_orderdate", "o_orderkey"], id_col="rn")
    return (ranked.select("o_orderkey", "o_orderdate", "rn")
                  .filter(F.col("rn").between(1001, 1100)))


@q("topk_orders_by_price",
   """SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
   "O4 top-k (newest-first trim analog, gemini_redshift_loader.py:488-492)")
def topk_orders_by_price(spark, sf_dir):
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100))
