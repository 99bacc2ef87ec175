"""Bloom-prefiltered decontamination: identical answers to the exact
path, with the train-side shuffle cut to matches + false positives."""
from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.dedup import (
    decontaminate_overlap, decontaminate_overlap_bloom, shingle_bloom_mask,
    word_shingles)
from s3_redshift_backup_tool_spark.operators.sampling import sample_by_hash


def test_bloom_equals_exact(spark, documents):
    train = sample_by_hash(documents, "doc_id", 0.8)
    evald = documents.join(train.select("doc_id"), "doc_id", "left_anti")
    exact = {tuple(r) for r in
             decontaminate_overlap(evald, train, threshold=0.5).collect()}
    bloom = {tuple(r) for r in
             decontaminate_overlap_bloom(evald, train,
                                         threshold=0.5).collect()}
    assert bloom == exact and len(exact) > 0


def test_bloom_gate_drops_disjoint_corpus(spark):
    """A train corpus sharing no vocabulary with the eval set should be
    almost entirely gated out map-side: surviving distinct shingles =
    false positives only (expected ~2% at these parameters, asserted
    loosely at <10%)."""
    evald = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(100 + i, " ".join(f"w{i}x{j}" for j in range(40)))
         for i in range(50)],
        "doc_id long, text string")
    mask = shingle_bloom_mask(evald, m_bits=1 << 14)
    # reuse the operator's own gate by running it and checking overlap
    out = decontaminate_overlap_bloom(evald, train, m_bits=1 << 14).collect()
    assert len(out) == 1 and out[0]["n_overlap"] == 0
    # direct gate-effectiveness check: count survivors
    from s3_redshift_backup_tool_spark.operators.dedup import (
        _bloom_position_cols)
    mask_df = spark.createDataFrame([(mask,)], "__bloom_mask: array<bigint>")
    gate = " AND ".join(
        f"((shiftright(element_at(__bloom_mask, "
        f"cast(__p{i} div 64 as int) + 1), "
        f"cast(__p{i} % 64 as int))) & 1) = 1" for i in range(4))
    tr = word_shingles(train).select("shingle").distinct()
    total = tr.count()
    surv = (tr.crossJoin(F.broadcast(mask_df))
              .select("shingle", "__bloom_mask",
                      *_bloom_position_cols(F.col("shingle"), 1 << 14, 4, 7))
              .filter(F.expr(gate)).count())
    assert total > 1000 and surv / total < 0.10


def test_mask_word_sign_roundtrip(spark):
    """Positions landing on bit 63 of a word must survive the
    array<bigint> round trip (two's complement)."""
    evald = spark.createDataFrame([(1, "a b c d e f g h i j k l")],
                                  "doc_id long, text string")
    # tiny filter forces high bit usage somewhere across seeds
    mask = shingle_bloom_mask(evald, m_bits=64, h_funcs=8, seed=3)
    assert len(mask) == 1
    out = decontaminate_overlap_bloom(evald, evald, m_bits=64,
                                      h_funcs=8, seed=3).collect()
    assert out[0]["overlap_frac"] == 1.0     # self-overlap fully kept


def test_bloom_semi_join_equals_plain_semi(spark, sf_dir):
    from tests.conftest import _rt
    from s3_redshift_backup_tool_spark.operators.skew import bloom_semi_join
    orders = _rt(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rich = (_rt(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > 5000)
            .select(F.col("c_custkey").alias("o_custkey")))
    got = bloom_semi_join(orders, rich, ["o_custkey"])
    want = orders.join(rich.distinct(), ["o_custkey"], "left_semi")
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in want.collect()}


def test_bloom_semi_join_null_keys_drop(spark):
    from s3_redshift_backup_tool_spark.operators.skew import bloom_semi_join
    big = spark.createDataFrame([(1, "x"), (None, "y"), (2, "z")],
                                "k int, v string")
    small = spark.createDataFrame([(1,), (None,)], "k int")
    out = bloom_semi_join(big, small, ["k"]).collect()
    # semi-join null semantics: NULL keys never match (same as plain)
    assert {r["v"] for r in out} == {"x"}


def test_bloom_gate_actually_prunes(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        _bloom_position_cols, bloom_gate_sql, bloom_mask_from_keys)
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(10)],
                                 "k string")
    mask = bloom_mask_from_keys(keys, "k", m_bits=1 << 12)
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(10)]
        + [(f"other-{i}",) for i in range(500)], "k string")
    mask_df = spark.createDataFrame([(mask,)], "__bloom_mask: array<bigint>")
    kept = (probe.crossJoin(F.broadcast(mask_df))
                 .select("k", "__bloom_mask",
                         *_bloom_position_cols(F.col("k"), 1 << 12, 4, 7))
                 .filter(F.expr(bloom_gate_sql(4)))
                 .count())
    assert 10 <= kept < 100   # all members kept; vast majority pruned
