"""Round-7 operators: incremental agg maintenance, record linkage, MMR,
compaction planning, Unicode normalization, ORC surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.incremental_agg import (
    agg_state, finalize_agg, merge_agg_states, retract_agg_states)
from s3_redshift_backup_tool_spark.operators.entity_resolution import (
    best_match, block_candidates, link_records)
from s3_redshift_backup_tool_spark.operators.layout import (
    compaction_plan, files_df_from_dir)
from s3_redshift_backup_tool_spark.operators.similarity import (
    cosine_topk, mmr_topk)
from s3_redshift_backup_tool_spark.operators.text import unicode_normalize
from tests.conftest import _rt

KEYS = ["o_orderstatus", "o_orderpriority"]
M = ["o_totalprice"]


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- agg state

@pytest.mark.parametrize("split_mod", [2, 5, 13])
def test_merge_split_equals_full(spark, sf_dir, split_mod):
    orders = _rt(spark, sf_dir, "orders")
    full = finalize_agg(agg_state(orders, KEYS, M), KEYS, M)
    a = agg_state(orders.where(F.col("o_orderkey") % split_mod == 0), KEYS, M)
    b = agg_state(orders.where(F.col("o_orderkey") % split_mod != 0), KEYS, M)
    merged = finalize_agg(merge_agg_states(KEYS, M, a, b), KEYS, M)
    assert _rows(merged) == _rows(full)


def test_merge_commutes_and_chains(spark, sf_dir):
    orders = _rt(spark, sf_dir, "orders")
    parts = [agg_state(orders.where(F.col("o_orderkey") % 3 == i), KEYS, M)
             for i in range(3)]
    ab = finalize_agg(merge_agg_states(KEYS, M, *parts), KEYS, M)
    ba = finalize_agg(merge_agg_states(KEYS, M, parts[2], parts[0], parts[1]),
                      KEYS, M)
    assert _rows(ab) == _rows(ba)


def test_retract_matches_recompute_for_retractable(spark, sf_dir):
    orders = _rt(spark, sf_dir, "orders")
    keep_cols = KEYS + ["o_totalprice_count", "o_totalprice_sum",
                        "o_totalprice_avg", "o_totalprice_stddev"]
    stored = agg_state(orders, KEYS, M)
    deleted = agg_state(orders.where(F.col("o_orderkey") % 4 == 0), KEYS, M)
    left = finalize_agg(retract_agg_states(KEYS, M, stored, deleted), KEYS, M)
    direct = finalize_agg(
        agg_state(orders.where(F.col("o_orderkey") % 4 != 0), KEYS, M),
        KEYS, M)
    assert _rows(left.select(*keep_cols)) == _rows(direct.select(*keep_cols))


def test_retract_nulls_minmax_on_touched_keys(spark, sf_dir):
    orders = _rt(spark, sf_dir, "orders")
    stored = agg_state(orders, KEYS, M)
    deleted = agg_state(orders.where(F.col("o_orderkey") % 4 == 0), KEYS, M)
    out = retract_agg_states(KEYS, M, stored, deleted)
    touched = out.where(F.col("o_totalprice__min").isNotNull()
                        | F.col("o_totalprice__max").isNotNull())
    # every group contains some %4==0 row at this scale -> all min/max NULL
    assert touched.count() == 0


def test_retract_drops_emptied_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, v double")
    stored = agg_state(df, ["k"], ["v"])
    deleted = agg_state(df.where(F.col("k") == "a"), ["k"], ["v"])
    out = retract_agg_states(["k"], ["v"], stored, deleted)
    assert [r["k"] for r in out.collect()] == ["b"]


def test_finalize_single_row_group_stddev_null(spark):
    df = spark.createDataFrame([("a", 5.0)], "k string, v double")
    fin = finalize_agg(agg_state(df, ["k"], ["v"]), ["k"], ["v"])
    row = fin.collect()[0]
    assert row["v_stddev"] is None and row["v_avg"] == 5.0


# ----------------------------------------------------------- record linkage

def test_linkage_recovers_identity_for_unperturbed(spark, sf_dir):
    cust = _rt(spark, sf_dir, "customer")
    dirty = cust.select(F.col("c_custkey").alias("d_key"),
                        F.col("c_name").alias("d_name"),
                        "c_nationkey", "c_mktsegment")
    out = link_records(dirty, cust, ["c_nationkey", "c_mktsegment"],
                       "d_key", "c_custkey", "d_name", "c_name",
                       threshold=0.99)
    got = {r["d_key"]: r["c_custkey"] for r in out.collect()}
    n = cust.count()
    assert len(got) == n and all(k == v for k, v in got.items())


def test_linkage_perturbed_mostly_correct(spark, sf_dir):
    cust = _rt(spark, sf_dir, "customer")
    key, name = F.col("c_custkey"), F.col("c_name")
    d_name = F.when(key % 2 == 0,
                    F.concat(F.substring(name, 1, 9), F.substring(name, 11, 100))
                    ).otherwise(name)
    dirty = cust.select(key.alias("d_key"), d_name.alias("d_name"),
                        "c_nationkey", "c_mktsegment")
    out = link_records(dirty, cust, ["c_nationkey", "c_mktsegment"],
                       "d_key", "c_custkey", "d_name", "c_name",
                       threshold=0.9)
    rows = out.collect()
    correct = sum(1 for r in rows if r["d_key"] == r["c_custkey"])
    # near-collision fixture names make some ties resolve to a sibling;
    # the bulk must still link home
    assert correct / cust.count() > 0.8


def test_banded_levenshtein_equals_unbanded(spark, sf_dir):
    cust = _rt(spark, sf_dir, "customer")
    key, name = F.col("c_custkey"), F.col("c_name")
    d_name = F.when(key % 2 == 0,
                    F.concat(F.substring(name, 1, 9), F.substring(name, 11, 100))
                    ).otherwise(name)
    dirty = cust.select(key.alias("d_key"), d_name.alias("d_name"),
                        "c_nationkey", "c_mktsegment")
    args = (dirty, cust, ["c_nationkey", "c_mktsegment"],
            "d_key", "c_custkey", "d_name", "c_name")
    full = link_records(*args, threshold=0.9)
    banded = link_records(*args, threshold=0.9, max_name_len=18)
    assert _rows(full) == _rows(banded)


def test_block_size_guard_drops_hot_blocks(spark):
    clean = spark.createDataFrame(
        [(i, "blk" if i < 8 else "cold", f"n{i}") for i in range(10)],
        "id int, blk string, name string")
    dirty = clean.select(F.col("id").alias("d_id"), "blk",
                         F.col("name").alias("d_name"))
    cand = block_candidates(dirty, clean, ["blk"], max_block_size=4)
    # the 8-row block is dropped; only the 2-row "cold" block pairs remain
    assert cand.count() == 4


def test_best_match_tie_breaks_to_lowest_key(spark):
    pairs = spark.createDataFrame(
        [(1, 10, 0.95), (1, 7, 0.95), (1, 9, 0.99)],
        "d int, c int, sim double")
    out = best_match(pairs, "d", "c", "sim", threshold=0.9).collect()
    assert len(out) == 1 and out[0]["c"] == 9
    out2 = best_match(pairs.where(F.col("c") != 9), "d", "c", "sim",
                      threshold=0.9).collect()
    assert out2[0]["c"] == 7


# ----------------------------------------------------------------- MMR

def test_mmr_first_pick_is_max_relevance(spark, sf_dir):
    emb = _rt(spark, sf_dir, "embeddings")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).head()["embedding"]]
    cand = emb.where(F.col("vec_id") != 0)
    mmr = mmr_topk(cand, qv, k=5, lam=0.7, shortlist_n=32).collect()
    top1 = cosine_topk(cand, qv, k=1).collect()[0]["vec_id"]
    assert mmr[0]["mmr_rank"] == 1 and mmr[0]["vec_id"] == top1
    ids = [r["vec_id"] for r in mmr]
    assert len(set(ids)) == 5


def test_mmr_lambda_one_reduces_to_topk(spark, sf_dir):
    emb = _rt(spark, sf_dir, "embeddings")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).head()["embedding"]]
    cand = emb.where(F.col("vec_id") != 0)
    mmr_ids = [r["vec_id"] for r in
               mmr_topk(cand, qv, k=5, lam=1.0, shortlist_n=32).collect()]
    top_ids = [r["vec_id"] for r in cosine_topk(cand, qv, k=5).collect()]
    assert mmr_ids == top_ids


def test_mmr_skips_near_duplicate(spark):
    rows = [(1, [1.0, 0.0, 0.0]),   # rel 1.0
            (2, [0.999, 0.001, 0.0]),  # near-dup of 1, rel ~1
            (3, [0.5, 0.5, 0.0])]   # diverse, lower rel
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # query == item 1's direction, so rel(d) == sim(d, item1) for every
    # candidate: with lam=0.5 step-2 scores tie at 0. lam<0.5 weights
    # redundancy harder than relevance and must skip the near-dup.
    out = mmr_topk(df, [1.0, 0.0, 0.0], k=2, lam=0.3, shortlist_n=3)
    ids = [r["vec_id"] for r in out.collect()]
    assert ids == [1, 3]


# ------------------------------------------------------------- compaction

def test_compaction_bins_bounded_and_complete(spark):
    files = spark.createDataFrame(
        [(f"f{i}", "p", (i % 7 + 1) * 10) for i in range(40)],
        "file_id string, part string, size_bytes long")
    plan = compaction_plan(files, ["part"], target_bytes=100)
    rows = plan.collect()
    assert sum(r["n_files"] for r in rows) == 40
    total = sum(r["bin_bytes"] for r in rows)
    assert total == sum((i % 7 + 1) * 10 for i in range(40))
    # next-fit by prefix: a bin overshoots the target by less than the
    # largest file it contains
    for r in rows:
        assert r["bin_bytes"] < 100 + 70


def test_compaction_single_large_file_gets_own_bin(spark):
    files = spark.createDataFrame(
        [("big", "p", 1000), ("s1", "p", 10), ("s2", "p", 10)],
        "file_id string, part string, size_bytes long")
    rows = {r["bin_id"]: r for r in
            compaction_plan(files, ["part"], target_bytes=100).collect()}
    # big lands alone in bin 0 region; the smalls share the next bin
    assert rows[10]["n_files"] == 2  # floor(1000/100)=10 for both smalls


def test_files_df_from_dir_lists_parquet(spark, tmp_path):
    d = tmp_path / "t"
    spark.range(100).write.parquet(str(d))
    fdf = files_df_from_dir(spark, str(d))
    rows = fdf.collect()
    assert len(rows) >= 1
    assert all(r["size_bytes"] > 0 for r in rows)


# ------------------------------------------------------------ normalization

def test_normalize_nfc_composes(spark):
    decomposed = "e\u0301clair"          # e + combining acute
    composed = "\u00e9clair"
    df = spark.createDataFrame([(decomposed,), ("caf\u00e9",), (None,)],
                               "text string")
    out = unicode_normalize(df, "text", "n", form="NFC", lower=False,
                         collapse_ws=False)
    vals = [r["n"] for r in out.collect()]
    assert vals[0] == composed and len(vals[0]) == 6
    assert vals[1] == "caf\u00e9"
    assert vals[2] is None


def test_normalize_nfkc_folds_compatibility(spark):
    df = spark.createDataFrame([("ﬁle ①",)], "text string")
    out = unicode_normalize(df, "text", "n", form="NFKC", lower=False,
                         collapse_ws=False)
    assert out.collect()[0]["n"] == "file 1"


def test_normalize_strip_accents_and_ws(spark):
    df = spark.createDataFrame([("  Caf\u00e9   du\tMonde ",)], "text string")
    out = unicode_normalize(df, "text", "n", form="NFC", lower=True,
                         strip_accents=True, collapse_ws=True)
    assert out.collect()[0]["n"] == "cafe du monde"


def test_normalize_rejects_bad_form(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        unicode_normalize(df, "text", "n", form="NFX")


# ------------------------------------------------------------------- ORC

def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from s3_redshift_backup_tool_spark.sources.readers import read_orc
    from s3_redshift_backup_tool_spark.sources.writers import write_orc
    orders = _rt(spark, sf_dir, "orders").limit(500)
    path = str(tmp_path / "orders_orc")
    write_orc(orders.withColumn("st", F.col("o_orderstatus")), path,
              partition_by=["st"])
    back = read_orc(spark, path)
    assert back.count() == 500
    # partition pruning works: one status directory only
    one = back.where(F.col("st") == "O")
    assert one.count() == orders.where(F.col("o_orderstatus") == "O").count()


# ------------------------------------------------------------------- KMV

def test_kmv_merge_of_slices_equals_full(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.sketches import (
        kmv_merge, kmv_sketch)
    docs = _rt(spark, sf_dir, "documents")
    full = kmv_sketch(docs, ["source"], "text", k=8)
    a = kmv_sketch(docs.where(F.col("doc_id") % 2 == 0), ["source"], "text", k=8)
    b = kmv_sketch(docs.where(F.col("doc_id") % 2 == 1), ["source"], "text", k=8)
    merged = kmv_merge(8, ["source"], a, b)
    assert _rows(full.select("source", "kmv_hash", "kmv_rank")) == \
        _rows(merged.select("source", "kmv_hash", "kmv_rank"))


def test_kmv_estimate_close_on_known_cardinality(spark):
    rows = [("g", f"elem-{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, e string")
    from s3_redshift_backup_tool_spark.operators.sketches import (
        kmv_estimate, kmv_sketch)
    est = kmv_estimate(kmv_sketch(df, ["g"], "e", k=64), ["g"], k=64)
    val = est.collect()[0]["kmv_est"]
    assert 600 < val < 1700  # k=64 rel-error ~1/sqrt(62) ≈ 13%, 3-sigma band


def test_kmv_unsaturated_is_exact(spark):
    df = spark.createDataFrame([("g", f"e{i}") for i in range(5)],
                               "g string, e string")
    from s3_redshift_backup_tool_spark.operators.sketches import (
        kmv_estimate, kmv_sketch)
    est = kmv_estimate(kmv_sketch(df, ["g"], "e", k=16), ["g"], k=16)
    assert est.collect()[0]["kmv_est"] == 5.0


# ----------------------------------------------------------------- funnel

def test_funnel_requires_strict_order(spark):
    import datetime as dt
    t = lambda s: dt.datetime(2024, 1, 1, s)
    rows = [  # user 1 completes in order; user 2 clicks BEFORE viewing
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        (2, t(5), "click"), (2, t(6), "view"),
        (3, t(1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    from s3_redshift_backup_tool_spark.operators.temporal import (
        funnel_conversions)
    out = funnel_conversions(df, "user_id", "ts", "event_type",
                             ["view", "click", "purchase"]).collect()[0]
    assert out["users_view"] == 3       # users 1, 2, 3
    assert out["users_click"] == 1      # only user 1 clicked after viewing
    assert out["users_purchase"] == 1
    assert abs(out["conv_view_click"] - 1 / 3) < 1e-6


def test_funnel_same_timestamp_not_counted(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, t0, "view"), (1, t0, "click")],
                               "user_id int, ts timestamp, event_type string")
    from s3_redshift_backup_tool_spark.operators.temporal import (
        funnel_conversions)
    out = funnel_conversions(df, "user_id", "ts", "event_type",
                             ["view", "click"]).collect()[0]
    assert out["users_view"] == 1 and out["users_click"] == 0


# --------------------------------------------------------------- outliers

def test_robust_outliers_flags_spike(spark):
    rows = [("g", float(v)) for v in [10, 12, 9, 11, 8, 10, 13, 1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    from s3_redshift_backup_tool_spark.operators.quality import (
        robust_outlier_stats)
    out = robust_outlier_stats(df, "g", "v").collect()[0]
    assert out["med"] == 10.5
    assert out["mad"] == 1.5
    assert out["n_outliers"] == 1       # only the 1000 spike
    assert out["n"] == 8


def test_robust_outliers_zero_mad_group(spark):
    rows = [("g", 5.0)] * 6 + [("g", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    from s3_redshift_backup_tool_spark.operators.quality import (
        robust_outlier_stats)
    out = robust_outlier_stats(df, "g", "v").collect()[0]
    # MAD is 0: every deviation > 0 is an outlier, deterministically
    assert out["mad"] == 0.0 and out["n_outliers"] == 1


# --------------------------------------------------------------- checksum

def test_checksum_detects_value_mangle_count_does_not(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.quality import checksum_audit
    orders = _rt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    mangled = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X"))
         .otherwise(F.col("o_orderstatus")))
    a = checksum_audit(orders.withColumn("g", F.lit(1)), ["g"]).collect()[0]
    b = checksum_audit(mangled.withColumn("g", F.lit(1)), ["g"]).collect()[0]
    assert a["n_rows"] == b["n_rows"]          # count check is blind
    assert a["content_xor"] != b["content_xor"]  # fingerprint is not


def test_checksum_is_partition_order_independent(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.quality import checksum_audit
    orders = _rt(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus").withColumn("g", F.lit(1))
    a = checksum_audit(orders, ["g"]).collect()[0]
    b = checksum_audit(orders.repartition(13), ["g"]).collect()[0]
    assert (a["n_rows"], a["content_xor"]) == (b["n_rows"], b["content_xor"])


def test_skew_report_known_distribution(spark):
    from s3_redshift_backup_tool_spark.operators.skew import skew_report
    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k").collect()[0]
    assert out["n_rows"] == 100 and out["n_keys"] == 3
    assert out["max_key_rows"] == 90 and out["max_key_share"] == 0.9


def test_kmv_union_of_sources_equals_global(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.sketches import (
        kmv_estimate, kmv_merge, kmv_sketch)
    docs = _rt(spark, sf_dir, "documents")
    per_src = (kmv_sketch(docs, ["source"], "text", k=12)
               .withColumn("g", F.lit(1)))
    merged = kmv_estimate(kmv_merge(12, ["g"], per_src), ["g"], k=12)
    direct = kmv_estimate(
        kmv_sketch(docs.withColumn("g", F.lit(1)), ["g"], "text", k=12),
        ["g"], k=12)
    assert _rows(merged) == _rows(direct)


# ------------------------------------------------------------ ranking eval

def _ranked(spark, rels):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(rank=i + 1, rel=r) for i, r in enumerate(rels)])


def test_ranking_metrics_known_values(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import (
        ranking_metrics)
    out = ranking_metrics(_ranked(spark, [1, 0, 1, 0, 0]), k=5,
                          n_relevant=2).collect()[0]
    import math
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    assert abs(out["ndcg_at_5"] - round(dcg / idcg, 6)) < 1e-9
    assert out["mrr"] == 1.0
    assert out["precision_at_5"] == 0.4


def test_ranking_metrics_perfect_is_one(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import (
        ranking_metrics)
    out = ranking_metrics(_ranked(spark, [1, 1, 1, 0, 0]), k=5,
                          n_relevant=3).collect()[0]
    assert out["ndcg_at_5"] == 1.0 and out["mrr"] == 1.0


def test_ranking_metrics_no_relevant_zero_not_null(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import (
        ranking_metrics)
    out = ranking_metrics(_ranked(spark, [0, 0, 0]), k=3,
                          n_relevant=0).collect()[0]
    assert out["ndcg_at_3"] == 0.0 and out["mrr"] == 0.0 \
        and out["precision_at_3"] == 0.0


def test_ranking_metrics_self_normalized_fallback(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import (
        ranking_metrics)
    # n_relevant=None -> IDCG over the relevants IN the list (2 here)
    out = ranking_metrics(_ranked(spark, [0, 1, 1]), k=3,
                          n_relevant=None).collect()[0]
    import math
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(out["ndcg_at_3"] - round(dcg / idcg, 6)) < 1e-9
    assert out["mrr"] == 0.5


# --------------------------------------------------------------- aHash

def _media_df(spark, rows, fmt="raw"):
    from s3_redshift_backup_tool_spark.operators.multimodal import attach_media
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_media(df, "text", "doc_id", media_type="image", fmt=fmt)


def test_ahash_identical_payloads_match(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import ahash_media
    t = "the quick brown fox jumps over the lazy dog " * 8
    out = {r["media_id"]: r["ahash"]
           for r in ahash_media(_media_df(spark, [(1, t), (2, t),
                                                  (3, t[::-1])])).collect()}
    assert out[1] == out[2] and out[1] is not None
    assert out[1] != out[3]


def test_ahash_small_edit_small_hamming(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        ahash_hamming_pairs, ahash_media)
    # high-contrast pseudorandom (NOT periodic: a periodic string puts
    # every block mean exactly AT the global mean — knife-edge ties
    # where one edit flips half the bits, faithful aHash behavior but
    # useless as a near-dup fixture; low-amplitude data has the same
    # marginal-block problem in milder form)
    base = "".join(chr(32 + (i * 53 + 11) % 95) for i in range(600))
    edited = base[:300] + "~" + base[301:]   # one changed byte
    other = "".join(chr(32 + (i * 29 + 5) % 95) for i in range(610))
    hashes = ahash_media(_media_df(spark, [(1, base), (2, edited),
                                           (3, other), (4, base)]))
    pairs = ahash_hamming_pairs(hashes, max_dist=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(1, 4)] == 0                  # exact dup found
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert (1, 3) not in got and (2, 3) not in got


def test_ahash_hamming_rejects_incomplete_config(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        ahash_hamming_pairs, ahash_media)
    hashes = ahash_media(_media_df(spark, [(1, "x" * 100)]))
    import pytest as _pt
    with _pt.raises(ValueError):
        ahash_hamming_pairs(hashes, max_dist=4, bands=4)


def test_ahash_bmp_decode_path(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_bmp
    from s3_redshift_backup_tool_spark.operators.multimodal import ahash_media
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    near = px.copy()
    near[0, 0] = [255, 255, 255]            # one-pixel retouch
    blobs = [(1, encode_bmp(px)), (2, encode_bmp(near)),
             (3, encode_bmp(rng.integers(0, 256, (16, 16, 3),
                                         dtype=np.uint8)))]
    from s3_redshift_backup_tool_spark.operators.multimodal import attach_media
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="image",
                         fmt="bmp")
    out = {r["media_id"]: r["ahash"] for r in ahash_media(media).collect()}
    assert all(v is not None for v in out.values())
    ham12 = bin(out[1] ^ out[2]).count("1")
    ham13 = bin(out[1] ^ out[3]).count("1")
    assert ham12 <= 4 < ham13   # retouch ~identical; unrelated far


def test_ahash_corrupt_payload_is_null_sentinel(spark):
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        ahash_media, attach_media)
    df = spark.createDataFrame([(1, bytearray(b"notabmp")), (2, None)],
                               "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="image",
                         fmt="bmp")
    out = {r["media_id"]: (r["ahash"], r["n_bytes"])
           for r in ahash_media(media).collect()}
    assert out[1][0] is None and out[2][0] is None and out[2][1] == 0


def test_ahash_wav_envelope_path(spark):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.codecs import encode_wav
    from s3_redshift_backup_tool_spark.operators.multimodal import (
        ahash_media, attach_media)
    t = np.arange(4000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t) * np.linspace(0.2, 1.0, t.size)
    noisy = tone + 1e-4 * np.sin(2 * np.pi * 7919 * t)
    other = np.sin(2 * np.pi * 97 * t) * np.linspace(1.0, 0.1, t.size)
    rows = [(1, bytearray(encode_wav(tone))),
            (2, bytearray(encode_wav(noisy))),
            (3, bytearray(encode_wav(other)))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = attach_media(df, "blob", "doc_id", media_type="audio",
                         fmt="wav")
    out = {r["media_id"]: r["ahash"] for r in ahash_media(media).collect()}
    assert all(v is not None for v in out.values())
    assert bin(out[1] ^ out[2]).count("1") <= 3   # near-identical audio
    assert bin(out[1] ^ out[3]).count("1") > 10   # different envelope


def test_calibration_bins_partition_and_sum(spark):
    from s3_redshift_backup_tool_spark.operators.classifier import (
        logreg_calibration)
    rows = [(0.0, -2.0), (0.0, -1.0), (1.0, 1.0), (1.0, 2.0)]
    df = spark.createDataFrame(rows, "y double, f double")
    # weights [bias, w_f] = [0, 1]: p = sigmoid(f)
    out = logreg_calibration(df, [0.0, 1.0], ["f"], "y",
                             n_bins=4).collect()
    assert sum(r["n"] for r in out) == 4
    import math
    lo = [r for r in out if r["bin"] == 0][0]     # sigmoid(-2)=.119
    hi = [r for r in out if r["bin"] == 3][0]     # sigmoid(2)=.881
    assert lo["frac_pos"] == 0.0 and hi["frac_pos"] == 1.0
    assert abs(lo["mean_pred"] - round(1 / (1 + math.e ** 2), 6)) < 1e-6


# ----------------------------------------------------------------- graphs

def test_kcore_peels_tail_keeps_core(spark):
    from s3_redshift_backup_tool_spark.operators.graph import kcore, kcore_peel
    # triangle 1-2-3 (2-core) with a pendant chain 3-4-5
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "id_a long, id_b long")
    out = {r["node"]: r["core_deg"] for r in kcore(pairs, k=2).collect()}
    assert set(out) == {1, 2, 3} and all(v == 2 for v in out.values())
    # fixed 3 rounds converge on this graph: identical to kcore()
    peeled = {r["node"]: r["core_deg"]
              for r in kcore_peel(pairs, k=2, rounds=3).collect()}
    assert peeled == out


def test_kcore_empty_when_no_core(spark):
    from s3_redshift_backup_tool_spark.operators.graph import kcore
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_a long, id_b long")
    assert kcore(chain, k=2).count() == 0


def test_cohort_retention_known_matrix(spark):
    import datetime as dt
    from s3_redshift_backup_tool_spark.operators.temporal import (
        cohort_retention)
    w0, w1 = dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 1, 8, 12)
    rows = [  # users 1,2 start week0; only user 1 returns week1;
              # user 3 starts week1
        (1, w0), (2, w0), (1, w1), (3, w1)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"].date().isoformat(), r["offset_w"]):
           (r["active_users"], r["cohort_n"], r["retention"])
           for r in cohort_retention(df, "user_id", "ts").collect()}
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)


# ------------------------------------------------------------ snapshot CDC

def test_snapshot_diff_ops_and_values(spark):
    from s3_redshift_backup_tool_spark.operators.cdc import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "CHANGED", 30.0), (4, "d", 40.0)],
        "k long, s string, v double")
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {1, 3, 4}              # 2 unchanged -> absent
    assert out[1]["op"] == "D" and out[1]["s"] == "a"   # old values on D
    assert out[3]["op"] == "U" and out[3]["s"] == "CHANGED"
    assert out[4]["op"] == "I" and out[4]["v"] == 40.0


def test_snapshot_diff_feeds_agg_maintenance(spark, tmp_path):
    """The cursor-less loop end-to-end: diff two snapshots, fold the
    I/D rows into a maintained aggregate, equals recompute on new."""
    from s3_redshift_backup_tool_spark.operators.cdc import snapshot_diff
    from s3_redshift_backup_tool_spark.plans.rollup import IncrementalRollup
    old = spark.createDataFrame(
        [(i, "g" if i % 2 == 0 else "h", float(i)) for i in range(100)],
        "k long, grp string, v double")
    new = old.where(F.col("k") % 7 != 0).unionByName(
        spark.createDataFrame([(1000, "g", 5.0)],
                              "k long, grp string, v double"))
    ru = IncrementalRollup(spark, str(tmp_path / "st"), ["grp"], "v")
    ru.apply(old)
    diff = snapshot_diff(old, new, ["k"])
    ru.apply(diff.where(F.col("op") == "I").drop("op"))
    ru.apply_deletes(diff.where(F.col("op") == "D").drop("op"))
    got = {r["grp"]: (r["n_rows"], r["sum_value"]) for r in ru.read().collect()}
    want = {r["grp"]: (r["n"], r["s"]) for r in
            new.groupBy("grp").agg(F.count(F.lit(1)).alias("n"),
                                   F.sum("v").alias("s")).collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert abs(got[g][1] - want[g][1]) < 1e-6


# ------------------------------------------------------------ corpus card

def test_corpus_report_shape_and_consistency(spark, sf_dir):
    import json
    from s3_redshift_backup_tool_spark.plans.report import corpus_report
    docs = _rt(spark, sf_dir, "documents")
    card = corpus_report(docs)
    json.dumps(card)                       # JSON-serializable contract
    assert card["n_docs"] == docs.count()
    assert sum(s["docs"] for s in card["volume"]) == card["n_docs"]
    assert sum(l["docs"] for l in card["languages"]) == card["n_docs"]
    dup = card["duplication"]
    assert 0.0 <= dup["exact_dup_rate"] < 1.0
    assert len(dup["kmv_per_source"]) == len(card["volume"])
    lp = card["length_percentiles"]
    assert lp["p10"] <= lp["p50"] <= lp["p90"]
    qq = card["quality_quartiles"]
    assert qq["p25"] <= qq["p50"] <= qq["p75"]


# -------------------------------------------------------- profiling/paths

def test_histogram_buckets_partition_rows(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        numeric_histogram)
    df = spark.createDataFrame([(float(i),) for i in range(100)]
                               + [(None,)], "v double")
    rows = numeric_histogram(df, "v", bins=4).collect()
    by = {r["bucket"]: r["n"] for r in rows}
    assert by[None] == 1
    assert sum(v for k, v in by.items() if k is not None) == 100
    # max value clamps into the last bucket, not bins
    assert set(k for k in by if k is not None) == {0, 1, 2, 3}


def test_histogram_constant_column(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        numeric_histogram)
    df = spark.createDataFrame([(5.0,)] * 7, "v double")
    rows = numeric_histogram(df, "v", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 7


def test_fk_audit_counts_orphans_and_nulls(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        fk_orphan_audit)
    facts = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k int")
    dim = spark.createDataFrame([(1,), (2,)], "d int")
    out = fk_orphan_audit(facts, "k", dim, "d").collect()[0]
    assert out["n_rows"] == 4 and out["n_null_keys"] == 1
    assert out["n_orphans"] == 1 and out["orphan_rate"] == 0.25


def test_session_paths_split_on_gap(spark):
    import datetime as dt
    from s3_redshift_backup_tool_spark.operators.temporal import (
        top_session_paths)
    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [(1, t0, 1, "view"), (1, t0 + dt.timedelta(minutes=5), 2, "click"),
            # > 30 min gap: new session
            (1, t0 + dt.timedelta(hours=2), 3, "view"),
            (2, t0, 4, "view"), (2, t0 + dt.timedelta(minutes=1), 5, "click")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {r["path"]: r["n_sessions"]
           for r in top_session_paths(df, "user_id", "ts", "event_type",
                                      tiebreak_col="event_id").collect()}
    assert out == {"view>click": 2, "view": 1}


# -------------------------------------------------------- compaction exec

def test_execute_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from s3_redshift_backup_tool_spark.operators.layout import (
        execute_compaction)
    d = str(tmp_path / "tbl")
    spark.range(10_000).repartition(24).write.parquet(d)
    import os
    n_before = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_before == 24
    report = execute_compaction(spark, d, target_bytes=10 * 1024 * 1024)
    after = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert report["."][0] == 24 and report["."][1] == after < 24
    assert spark.read.parquet(d).count() == 10_000


def test_execute_compaction_partitioned(spark, tmp_path):
    from s3_redshift_backup_tool_spark.operators.layout import (
        execute_compaction)
    from pyspark.sql import functions as F2
    d = str(tmp_path / "ptbl")
    (spark.range(6000).withColumn("p", (F2.col("id") % 3).cast("int"))
          .repartition(12).write.partitionBy("p").parquet(d))
    report = execute_compaction(spark, d, target_bytes=50 * 1024 * 1024)
    assert set(report) == {"p=0", "p=1", "p=2"}
    assert all(after <= before for before, after in report.values())
    back = spark.read.parquet(d)
    assert back.count() == 6000
    assert back.select("p").distinct().count() == 3


def test_matryoshka_truncate_and_renorm(spark, sf_dir):
    import numpy as np
    from s3_redshift_backup_tool_spark.operators.similarity import (
        matryoshka_truncate)
    emb = _rt(spark, sf_dir, "embeddings").limit(5)
    tr = matryoshka_truncate(emb, 16, renormalize=True).collect()
    for r in tr:
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert v.size == 16
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
