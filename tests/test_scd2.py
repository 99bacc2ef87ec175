"""SCD Type 2: batch reconstruction vs incremental maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.plans.scd2 import SCD2Target, scd2_from_log


def _canon(df):
    # None-safe sort: valid_to is NULL on current rows, and ties on the
    # leading columns (duplicate same-ts events) would otherwise compare
    # None against int and raise
    def _key(t):
        return tuple((v is None, v) for v in t)
    return sorted((tuple(r) for r in
                   df.select("user_id", "event_type", "valid_from",
                             "valid_to", "is_current").collect()),
                  key=_key)


def test_scd2_from_log_hand_case(spark):
    rows = [
        (1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3), (1, "a", 40, 4),
        (2, "x", 15, 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    out = {(r["user_id"], r["valid_from"]): r for r in
           scd2_from_log(df, "user_id", "event_type", "ts", "event_id")
           .collect()}
    assert len(out) == 4                       # a[10,30) b[30,40) a[40,-) x
    assert out[(1, 10)]["valid_to"] == 30 and not out[(1, 10)]["is_current"]
    assert out[(1, 30)]["event_type"] == "b" and out[(1, 30)]["valid_to"] == 40
    assert out[(1, 40)]["is_current"] and out[(1, 40)]["valid_to"] is None
    assert out[(2, 15)]["is_current"]


def test_scd2_incremental_equals_batch(spark, events, tmp_path):
    """Folding the log in 3 CDC batches (split on time) must equal the
    one-shot reconstruction of the whole log — including keys that only
    appear in later batches."""
    ev = events.select("user_id", "event_type", "ts", "event_id")
    t = SCD2Target(spark, str(tmp_path / "dim"), "user_id", "event_type",
                   "ts", "event_id")
    # split on ts (not ingestion order): batches must respect the
    # per-key monotone-timestamp contract CDC extraction guarantees
    tq = [r[0] for r in
          ev.select(F.expr("percentile(cast(ts as double), array(0.33, 0.66))")
                    .alias("p")).select(F.explode("p")).collect()]
    b1 = ev.filter(F.col("ts").cast("double") <= tq[0])
    b2 = ev.filter((F.col("ts").cast("double") > tq[0])
                   & (F.col("ts").cast("double") <= tq[1]))
    b3 = ev.filter(F.col("ts").cast("double") > tq[1])
    for b in (b1, b2, b3):
        t.apply(b)
    want = _canon(scd2_from_log(ev, "user_id", "event_type", "ts", "event_id"))
    got = _canon(t.read())
    assert got == want


def test_scd2_replay_is_idempotent(spark, tmp_path):
    rows1 = [(1, "a", 10, 1), (1, "b", 20, 2)]
    df1 = spark.createDataFrame(
        rows1, "user_id long, event_type string, ts long, event_id long")
    t = SCD2Target(spark, str(tmp_path / "dim"), "user_id", "event_type",
                   "ts", "event_id")
    t.apply(df1)
    before = _canon(t.read())
    t.apply(df1)                       # at-least-once redelivery
    assert _canon(t.read()) == before
    assert len(before) == 2


def test_scd2_untouched_keys_not_rewritten(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "x", 10, 2)],
        "user_id long, event_type string, ts long, event_id long")
    df2 = spark.createDataFrame(
        [(1, "b", 20, 3)],
        "user_id long, event_type string, ts long, event_id long")
    t = SCD2Target(spark, str(tmp_path / "dim"), "user_id", "event_type",
                   "ts", "event_id")
    t.apply(df1)
    t.apply(df2)
    rows = _canon(t.read())
    assert (2, "x", 10, None, True) in rows          # untouched, still open
    assert (1, "a", 10, 20, False) in rows
    assert (1, "b", 20, None, True) in rows


# ---------------------------------------------------------- properties

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# random per-key change logs: a few keys, few attr values (to force
# collapses), strictly increasing seq; ts drawn small so ties happen
_log_rows = st.lists(
    st.tuples(st.integers(1, 4),                 # key
              st.sampled_from(["a", "b", "c"]),  # attr
              st.integers(0, 20)),               # ts
    min_size=1, max_size=30)


@settings(max_examples=15, deadline=None)
@given(rows=_log_rows, cut=st.integers(1, 19))
def test_scd2_incremental_equals_batch_property(spark, tmp_path_factory,
                                                rows, cut):
    """For ANY change log and ANY ts-ordered two-batch split, folding
    batches incrementally equals one-shot reconstruction. seq is the
    global row index, so equal-ts rows keep a deterministic order and
    the split at a ts boundary respects the per-key monotone contract."""
    data = [(k, a, t, i) for i, (k, a, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id long, event_type string, ts long, event_id long")
    tgt = SCD2Target(spark, str(tmp_path_factory.mktemp("scd2") / "dim"),
                     "user_id", "event_type", "ts", "event_id")
    b1 = df.filter(F.col("ts") < cut)
    b2 = df.filter(F.col("ts") >= cut)
    for b in (b1, b2):
        if b.count():
            tgt.apply(b)
    want = _canon(scd2_from_log(df, "user_id", "event_type", "ts",
                                "event_id"))
    assert _canon(tgt.read()) == want


def test_dim_as_of_point_in_time(spark):
    from s3_redshift_backup_tool_spark.plans.scd2 import dim_as_of
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 30, 2), (2, "x", 20, 3)],
        "user_id long, event_type string, ts long, event_id long")
    dim = scd2_from_log(df, "user_id", "event_type", "ts", "event_id")
    at25 = {(r["user_id"], r["event_type"])
            for r in dim_as_of(dim, 25).collect()}
    assert at25 == {(1, "a"), (2, "x")}      # b starts at 30
    at30 = {(r["user_id"], r["event_type"])
            for r in dim_as_of(dim, 30).collect()}
    assert at30 == {(1, "b"), (2, "x")}      # boundary: valid_from <= ts
    assert dim_as_of(dim, 5).count() == 0    # before any history


def test_streaming_scd2_maintenance(spark, tmp_path):
    from s3_redshift_backup_tool_spark.streaming.incremental import (
        streaming_scd2_maintenance)

    src = str(tmp_path / "cdc")
    state = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "x", 10, 2)],
        "user_id long, event_type string, ts long, event_id long")
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_scd2_maintenance(spark, src, schema, state, ckpt,
                               "user_id", "event_type", "ts", "event_id")
    b2 = spark.createDataFrame(
        [(1, "b", 20, 3)],
        "user_id long, event_type string, ts long, event_id long")
    b2.write.mode("append").parquet(src)
    streaming_scd2_maintenance(spark, src, schema, state, ckpt,
                               "user_id", "event_type", "ts", "event_id")
    # no-op pass: nothing new, state unchanged
    streaming_scd2_maintenance(spark, src, schema, state, ckpt,
                               "user_id", "event_type", "ts", "event_id")
    rows = _canon(spark.read.parquet(state))
    want = _canon(scd2_from_log(
        spark.read.parquet(src), "user_id", "event_type", "ts", "event_id"))
    assert rows == want
    assert (1, "a", 10, 20, False) in rows and (2, "x", 10, None, True) in rows


def test_scd2_asof_join_facts_to_dimension_version(spark):
    """The consumption pattern: each fact joined to the dimension
    VERSION valid at the fact's event time — SCD2 segments fed through
    the as-of join; verified against a brute-force per-fact lookup."""
    from s3_redshift_backup_tool_spark.operators.temporal import asof_join

    log = spark.createDataFrame(
        [(1, "bronze", 10, 1), (1, "silver", 30, 2), (1, "gold", 50, 3),
         (2, "bronze", 20, 4)],
        "user_id long, event_type string, ts long, event_id long")
    dim = scd2_from_log(log, "user_id", "event_type", "ts", "event_id")
    facts = spark.createDataFrame(
        [(101, 1, 15), (102, 1, 30), (103, 1, 49), (104, 1, 99),
         (105, 2, 25), (106, 2, 5)],           # 106 predates any version
        "fact_id long, user_id long, fact_ts long")
    joined = asof_join(
        facts, dim.select("user_id", "event_type",
                          F.col("valid_from").alias("vf")),
        on="user_id", left_ts="fact_ts", right_ts="vf",
        right_cols=["event_type"])
    got = {r["fact_id"]: r["event_type"] for r in joined.collect()}
    assert got == {101: "bronze", 102: "silver", 103: "silver",
                   104: "gold", 105: "bronze", 106: None}
