"""Incremental rollup == from-scratch aggregate after any delta sequence."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup


def _full(df):
    v = F.col("value").cast("double")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(v).alias("sum_value"),
        F.min(v).alias("min_value"), F.max(v).alias("max_value"),
        (F.sum(v) / F.count(F.lit(1))).alias("avg_value"))


def test_incremental_equals_full_recompute(spark, events, tmp_path):
    ev = events.select("event_id", "event_type", "value").limit(3000)
    d1 = ev.filter(F.col("event_id") % 3 == 0)
    d2 = ev.filter(F.col("event_id") % 3 == 1)
    d3 = ev.filter(F.col("event_id") % 3 == 2)

    ru = IncrementalRollup(spark, str(tmp_path / "state"),
                           ["event_type"], "value")
    for d in (d1, d2, d3):
        ru.apply(d)

    got = {r["event_type"]: r for r in ru.read().collect()}
    want = {r["event_type"]: r for r in _full(ev).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_rows"] == want[k]["n_rows"]
        assert abs(got[k]["sum_value"] - want[k]["sum_value"]) < 1e-6
        assert got[k]["min_value"] == want[k]["min_value"]
        assert got[k]["max_value"] == want[k]["max_value"]
        assert abs(got[k]["avg_value"] - want[k]["avg_value"]) < 1e-9


def test_rollup_state_stays_one_row_per_group(spark, events, tmp_path):
    ev = events.select("event_id", "event_type", "value").limit(1000)
    ru = IncrementalRollup(spark, str(tmp_path / "state"),
                           ["event_type"], "value")
    n_groups = ev.select("event_type").distinct().count()
    for _ in range(4):  # re-applying different slices never grows state
        ru.apply(ev.sample(0.5, seed=1))
    assert spark.read.parquet(str(tmp_path / "state")).count() == n_groups


def test_aqe_skew_join_splits_skewed_partition(spark, sf_dir):
    """AQE's built-in skew-join split (the complement of operators/skew.py
    salting): with thresholds lowered to fixture scale, the skewed-side
    sort-merge join partitions are split at runtime (isSkew=true in the
    final plan). At 100 TB the production defaults (256MB partition,
    factor 5) trigger on real skew without code changes."""
    from s3_redshift_backup_tool_spark.sources.readers import read_table

    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # the downstream groupBy imposes a distribution requirement the
        # split would violate, so AQE declines unless told the extra
        # exchange is worth it — exactly the production trade for a
        # straggler-dominated stage
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # hot key: all rows land on 2 join keys. repartition(8) first —
        # skew splits follow MAP-side block boundaries, so a single-
        # mapper shuffle (the 1-row-group fixture scan) cannot be split
        # no matter how skewed; any real multi-file table has many
        # mappers.
        li = (read_table(spark, sf_dir, "lineitem").repartition(8)
              .withColumn("k", F.col("l_orderkey") % 2))  # 2 keys, heavy skew
        right = spark.range(2).withColumnRenamed("id", "k")
        j = li.join(right, "k").groupBy("k").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rollup_recovers_half_finished_swap(spark, events, tmp_path):
    """Crash window between the two renames: state moved aside, promote
    never happened — the next apply/read must restore the aside copy,
    not silently restart the rollup from empty."""
    import os
    import shutil

    ev = events.select("event_id", "event_type", "value").limit(500)
    state = str(tmp_path / "state")
    ru = IncrementalRollup(spark, state, ["event_type"], "value")
    ru.apply(ev)
    before = {r["event_type"]: r["n_rows"] for r in ru.read().collect()}

    # simulate the crash: state renamed aside + a stale half-written tmp
    os.rename(state, state + "__old")
    os.makedirs(state + "__tmpdead")
    assert not os.path.isdir(state)

    after = {r["event_type"]: r["n_rows"] for r in ru.read().collect()}
    assert after == before
    assert not os.path.isdir(state + "__old")
    assert not os.path.isdir(state + "__tmpdead")


def test_compact_recovers_half_finished_swap(spark, orders, tmp_path):
    import os

    from s3_redshift_backup_tool_spark.plans.compact import compact_target

    tgt = str(tmp_path / "tgt")
    orders.limit(100).write.parquet(tgt)
    n = 100
    os.rename(tgt, tgt + "__precompact")  # crash mid-swap
    res = compact_target(spark, tgt, key_cols=["o_orderkey"],
                         ts_col="o_orderdate")
    assert res.rows_before == n and res.rows_after == n
    assert spark.read.parquet(tgt).count() == n


def test_psi_drift_finite_on_empty_side(spark, documents):
    import math

    from s3_redshift_backup_tool_spark.operators.quality import psi_drift

    ref = documents.select("doc_id", "n_chars")
    cur = ref.filter("doc_id < 0")  # empty snapshot
    r = psi_drift(ref, cur, "n_chars").first()
    assert r["n_cur_rows"] == 0
    assert r["psi"] is not None and math.isfinite(r["psi"])


def test_psi_drift_zero_for_identical_and_large_for_shifted(spark, documents):
    from s3_redshift_backup_tool_spark.operators.quality import psi_drift

    ref = documents.select("n_chars")
    same = psi_drift(ref, ref, "n_chars").first()["psi"]
    assert abs(same) < 1e-6
    from pyspark.sql import functions as F
    shifted = psi_drift(ref, ref.select(
        (F.col("n_chars") * 3).alias("n_chars")), "n_chars").first()["psi"]
    assert shifted > 0.25  # drifted by the standard gate


def test_psi_drift_finite_on_empty_reference(spark, documents):
    """Mirror of the empty-current case: an empty ref side has no min/max
    to derive buckets from — fall back to the unit range, stay finite."""
    import math

    from s3_redshift_backup_tool_spark.operators.quality import psi_drift

    cur = documents.select("doc_id", "n_chars")
    ref = cur.filter("doc_id < 0")  # empty snapshot
    r = psi_drift(ref, cur, "n_chars").first()
    assert r["n_ref_rows"] == 0 and r["n_cur_rows"] > 0
    assert r["psi"] is not None and math.isfinite(r["psi"])


def test_incremental_rollup_nested_state_path_first_apply(spark, orders,
                                                          tmp_path):
    """First apply() with a state path whose PARENT doesn't exist yet must
    not die in recovery's parent-dir listing (round-3 advisor finding)."""
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup

    state = str(tmp_path / "not" / "yet" / "created" / "state")
    r = IncrementalRollup(spark, state, keys=["o_orderstatus"],
                          value_col="o_totalprice")
    r.apply(orders.limit(50))
    assert r.read().count() > 0


def test_incremental_cms_sketch_maintenance(spark, documents, tmp_path):
    """A count-min sketch is counter-wise additive, so incremental
    maintenance is exactly IncrementalRollup over keys (d, bucket):
    sketch(delta 1) + sketch(delta 2) + ... == sketch(whole corpus),
    without ever re-scanning earlier deltas."""
    from s3_redshift_backup_tool_spark.operators.sketches import cms_sketch
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup

    r = IncrementalRollup(spark, str(tmp_path / "cms_state"),
                          keys=["d", "bucket"], value_col="c")
    for m in range(3):
        r.apply(cms_sketch(documents.filter(f"doc_id % 3 = {m}"),
                           depth=4, width=512))
    got = {(row["d"], row["bucket"]): int(row["sum_value"])
           for row in r.read().collect()}
    want = {(row["d"], row["bucket"]): row["c"]
            for row in cms_sketch(documents, depth=4, width=512).collect()}
    assert got == want


def test_rollup_retracts_deletes(spark, events, tmp_path):
    ev = events.select("event_id", "event_type", "value").limit(2000)
    ru = IncrementalRollup(spark, str(tmp_path / "state"),
                           ["event_type"], "value")
    ru.apply(ev)
    dels = ev.filter(F.col("event_id") % 5 == 0)
    ru.apply_deletes(dels)
    got = {r["event_type"]: r for r in ru.read().collect()}
    want = {r["event_type"]: r
            for r in _full(ev.filter(F.col("event_id") % 5 != 0)).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_rows"] == want[k]["n_rows"]
        assert abs(got[k]["sum_value"] - want[k]["sum_value"]) < 1e-6
        assert abs(got[k]["avg_value"] - want[k]["avg_value"]) < 1e-9
        # min/max were touched by the deletes: honest NULLs, not stale
        assert got[k]["min_value"] is None and got[k]["max_value"] is None
