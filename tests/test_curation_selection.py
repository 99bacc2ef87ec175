"""Data-selection operators: greedy k-center coreset and
prototypicality-based pruning (Sorscher'22). Values are checked on
constructed fixtures where the greedy trace / ranks are hand-derivable;
the registry entries check the same code against the DuckDB oracle on
the real tables."""

from __future__ import annotations

from pyspark.sql import types as T

from s3_redshift_backup_tool_spark.operators.similarity import (
    kcenter_coreset, prototypicality_prune)

_EMB = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("label", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, lab, [float(x) for x in v]) for i, lab, v in rows], _EMB)


def test_kcenter_greedy_trace(spark):
    # 1-D line: seed = lowest id (0.0); then 10 (d=100), then 6
    # (min(36,16)=16), then 3 (min(9,49,9)=9)
    df = _emb_df(spark, [(0, 0, [0.0]), (1, 0, [10.0]),
                         (2, 0, [6.0]), (3, 0, [3.0])])
    got = {r["sel_rank"]: (r["vec_id"], r["dist_at_selection"])
           for r in kcenter_coreset(df, k=4).collect()}
    assert got == {1: (0, 0.0), 2: (1, 100.0), 3: (2, 16.0), 4: (3, 9.0)}


def test_kcenter_distance_trace_non_increasing(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    emb = read_table(spark, sf_dir, "embeddings")
    trace = (kcenter_coreset(emb, k=6).orderBy("sel_rank").collect())
    dists = [r["dist_at_selection"] for r in trace[1:]]  # skip the seed
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in trace}) == 6  # distinct picks


def test_kcenter_tie_breaks_to_lowest_id(spark):
    # ids 1 and 2 both at distance 25 from the seed: rank 2 must pick 1
    df = _emb_df(spark, [(0, 0, [0.0]), (1, 0, [5.0]), (2, 0, [-5.0])])
    got = {r["sel_rank"]: r["vec_id"]
           for r in kcenter_coreset(df, k=2).collect()}
    assert got[2] == 1


def test_prototypicality_ranks_and_prune_flag(spark):
    # label 0: values 0,1,5 -> centroid 2 -> dists 4,1,9 ->
    # pct ranks (by dist asc): id1=0.0, id0=0.5, id2=1.0
    # label 1: single row -> pct 0.0 (SQL percent_rank convention)
    df = _emb_df(spark, [(0, 0, [0.0]), (1, 0, [1.0]), (2, 0, [5.0]),
                         (3, 1, [7.0])])
    got = {r["vec_id"]: r for r in prototypicality_prune(df).collect()}
    assert got[1]["proto_pct"] == 0.0 and got[1]["prune_first"]
    assert got[0]["proto_pct"] == 0.5 and not got[0]["prune_first"]
    assert got[2]["proto_pct"] == 1.0 and not got[2]["prune_first"]
    assert got[3]["proto_pct"] == 0.0 and got[3]["prune_first"]
    assert got[0]["proto_dist"] == 4.0 and got[2]["proto_dist"] == 9.0


def test_prototypicality_avoids_label_partitioned_window(spark, sf_dir):
    """The within-label rank must come from the range-exchange global-id
    path, not Window.partitionBy(label): class labels are few, so a
    label-partitioned window serializes the corpus through n_labels
    tasks at scale. The only window allowed in the plan is the
    per-spark-partition local row_number of assign_global_ids."""
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    emb = read_table(spark, sf_dir, "embeddings")
    plan = prototypicality_prune(emb)._jdf.queryExecution() \
        .optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__pid" in line, f"label-keyed window found: {line}"
