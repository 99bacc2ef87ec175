"""Data-selection & batch-planning operators, third r13 batch: DSIR
importance weights (Xie'23), DoReMi domain reweighting (Xie'23), and
length-bucketed batch planning. Values are checked on constructed
fixtures where the math is hand-derivable; the registry entries check
the same code against the DuckDB oracle on the real tables."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_redshift_backup_tool_spark.operators.sampling import (
    doremi_weights, length_buckets)
from s3_redshift_backup_tool_spark.operators.text import dsir_logratio

_DOC = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("grp", T.StringType()),
    T.StructField("text", T.StringType()),
])


def _docs(spark, rows):
    return spark.createDataFrame(list(rows), _DOC)


# --------------------------------------------------------------- DSIR

def test_dsir_separates_target_like_docs(spark):
    # target docs speak "alpha beta", raw background speaks "gamma
    # delta": a fresh doc made of target tokens must outscore one made
    # of background tokens (that is the whole point of the weight).
    # Only the ORDERING is asserted — at toy counts the add-one
    # smoothing shifts every weight by ~ln((R+B)/(T+B)) < 0 (T < R
    # since raw contains target), so absolute signs are scale
    # artifacts; avg_logratio normalizes length so the short docs
    # compare fairly.
    rows = [(i, "t", "alpha beta alpha beta") for i in range(5)]
    rows += [(i + 10, "r", "gamma delta gamma delta") for i in range(5)]
    rows += [(100, "r", "alpha beta alpha"),   # target-looking raw doc
             (101, "r", "gamma delta gamma")]  # background-looking
    out = dsir_logratio(_docs(spark, rows), F.col("grp") == "t",
                        n_buckets=64)
    got = {r["doc_id"]: r["avg_logratio"] for r in out.collect()}
    assert got[100] > got[101]
    assert min(got[i] for i in range(5)) > max(got[i + 10]
                                               for i in range(5))


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    out = dsir_logratio(_docs(spark, [(1, "t", "a b c"),
                                      (2, "r", "a")]),
                        F.col("grp") == "t", n_buckets=16)
    got = {r["doc_id"]: r["n_feats"] for r in out.collect()}
    assert got == {1: 5, 2: 1}  # 3 words + 2 bigrams; single word


def test_dsir_weight_matches_hand_computation(spark):
    # One bucket per feature (no collisions at B=4096 for 2 tokens is
    # not guaranteed — so verify via the identity that the per-doc
    # weight equals sum(n_b * lambda_b) recomputed from scratch in
    # python on the SAME hashed buckets).
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    b = 64
    rows = [(1, "t", "x y"), (2, "r", "y z"), (3, "r", "x y")]
    feats = {1: ["x", "y", "x y"], 2: ["y", "z", "y z"],
             3: ["x", "y", "x y"]}
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    for d, fs in feats.items():
        for f_ in fs:
            bk = h(f_) % b
            rcnt[bk] = rcnt.get(bk, 0) + 1
            if d == 1:
                tcnt[bk] = tcnt.get(bk, 0) + 1
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    lam = {bk: (math.log(tcnt.get(bk, 0) + 1) - math.log(tt + b)
                - math.log(rcnt[bk] + 1) + math.log(rt + b))
           for bk in rcnt}
    want = {d: round(sum(lam[h(f_) % b] for f_ in fs), 6)
            for d, fs in feats.items()}
    out = dsir_logratio(_docs(spark, rows), F.col("grp") == "t",
                        n_buckets=b)
    got = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    assert got == want


def test_dsir_bucket_join_is_broadcast(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    plan = (dsir_logratio(docs, F.col("lang") == "en")
            ._jdf.queryExecution().executedPlan().toString())
    # the <=B-row bucket table must come back as a broadcast join, and
    # nothing in the plan may be a nested-loop over corpus-sized sides
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------- DoReMi

def test_doremi_weights_sum_to_one_and_tilt_to_lossy_domain(spark):
    # domain "b" has double the loss of "a"; equal token mass.
    rows = [(1, "a", 0.1, 10.0), (2, "a", 0.1, 10.0),
            (3, "b", 0.3, 10.0), (4, "b", 0.3, 10.0)]
    df = spark.createDataFrame(rows, ["id", "dom", "l", "tok"])
    out = {r["dom"]: r for r in
           doremi_weights(df, "dom", F.col("l"), "tok").collect()}
    total = out["a"]["doremi_weight"] + out["b"]["doremi_weight"]
    assert abs(total - 1.0) < 1e-5
    assert out["b"]["doremi_weight"] > out["b"]["token_share"]
    assert out["a"]["doremi_weight"] < out["a"]["token_share"]
    # excess is clamped at zero for the below-reference domain
    assert out["a"]["excess"] == 0.0 and out["b"]["excess"] > 0.0


def test_doremi_uniform_loss_returns_token_shares(spark):
    # no domain beats the reference -> every excess is 0 -> the EG
    # update is the identity and weights == token shares exactly.
    rows = [(1, "a", 0.2, 30.0), (2, "b", 0.2, 10.0),
            (3, "c", 0.2, 60.0)]
    df = spark.createDataFrame(rows, ["id", "dom", "l", "tok"])
    for r in doremi_weights(df, "dom", F.col("l"), "tok").collect():
        assert abs(r["doremi_weight"] - r["token_share"]) <= 1e-6
        assert r["excess"] == 0.0


def test_doremi_closed_form_matches_unrolled_eg(spark):
    # the closed form must equal T explicit multiplicative updates
    # renormalized at the end (same thing for a static excess).
    rows = [(1, "a", 0.05, 40.0), (2, "b", 0.50, 40.0),
            (3, "c", 0.35, 20.0)]
    df = spark.createDataFrame(rows, ["id", "dom", "l", "tok"])
    got = {r["dom"]: r for r in
           doremi_weights(df, "dom", F.col("l"), "tok",
                          eta=0.5, steps=4, smoothing=0.2).collect()}
    # reference = corpus per-ROW mean loss (one row per domain here)
    ref = round((0.05 + 0.50 + 0.35) / 3, 6)
    u = {"a": 0.4, "b": 0.4, "c": 0.2}
    ex = {d: round(max(round(l, 6) - ref, 0.0), 6)
          for d, l in (("a", 0.05), ("b", 0.50), ("c", 0.35))}
    w = dict(u)
    for _ in range(4):
        w = {d: w[d] * math.exp(0.5 * ex[d]) for d in w}
    z = sum(w.values())
    for d in w:
        want = 0.8 * w[d] / z + 0.2 * u[d]
        assert abs(got[d]["doremi_weight"] - want) < 1e-6


# ------------------------------------------------------ length buckets

def test_length_buckets_partition_and_monotone(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    rows = sorted(length_buckets(docs, F.size(F.split("text", " ")),
                                 n_buckets=8).collect(),
                  key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(8))
    assert sum(r["n_docs"] for r in rows) == n
    # equal-population cut: bucket sizes differ by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # ranked by length: bucket boundaries are non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert a["max_tokens"] <= b["min_tokens"]
    # bucketing can only reduce pad-to-longest waste vs one bucket
    corpus_max = rows[-1]["max_tokens"]
    single = n * corpus_max - sum(r["sum_tokens"] for r in rows)
    assert sum(r["pad_waste"] for r in rows) <= single


def test_length_buckets_waste_math(spark):
    # two buckets over 4 docs of lengths 1,2,3,4: bucket 0 = {1,2}
    # (max 2, waste 1), bucket 1 = {3,4} (max 4, waste 1)
    rows = [(i, "g", " ".join(["w"] * i)) for i in (1, 2, 3, 4)]
    got = {r["bucket"]: r for r in
           length_buckets(_docs(spark, rows),
                          F.size(F.split("text", " ")),
                          n_buckets=2).collect()}
    assert got[0]["max_tokens"] == 2 and got[0]["pad_waste"] == 1
    assert got[1]["max_tokens"] == 4 and got[1]["pad_waste"] == 1
    assert got[0]["waste_frac"] == round(1 / 4, 6)
    assert got[1]["waste_frac"] == round(1 / 8, 6)


def test_length_buckets_avoid_unpartitioned_window(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    plan = (length_buckets(docs, F.size(F.split("text", " ")))
            ._jdf.queryExecution().executedPlan().toString())
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__pid" in line, f"global window found: {line}"


# ------------------------------------------- per-group score ranks

def test_score_rank_by_group_hand_values(spark):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        score_rank_by_group)
    # group a: scores 1,2,3 -> pct 0, .5, 1; group b: single row -> 0.0
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "b", 9.0)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "s"])
    got = {r["doc_id"]: r for r in
           score_rank_by_group(df, "grp", F.col("s")).collect()}
    assert [got[i]["rank_pct"] for i in (1, 2, 3)] == [0.0, 0.5, 1.0]
    assert got[4]["rank_pct"] == 0.0
    assert got[3]["keep"] and got[2]["keep"] and not got[1]["keep"]


def test_score_rank_keeps_same_fraction_per_group(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        score_rank_by_group)
    from s3_redshift_backup_tool_spark.operators.text import quality_score
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    out = score_rank_by_group(docs, "source", quality_score(F.col("text")))
    per = (out.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("keep").cast("long")).alias("k"))
              .collect())
    # the whole point vs a global threshold: every source keeps ~half
    for r in per:
        assert abs(r["k"] / r["n"] - 0.5) <= 0.5 / r["n"] + 0.02


def test_score_rank_avoids_group_partitioned_window(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        score_rank_by_group)
    from s3_redshift_backup_tool_spark.operators.text import quality_score
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    plan = (score_rank_by_group(docs, "source",
                                quality_score(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString())
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__pid" in line, f"group-keyed window found: {line}"


# ------------------------------------------------ filter agreement

def test_filter_agreement_hand_counts(spark):
    from s3_redshift_backup_tool_spark.operators.text import (
        filter_agreement)
    # flags by construction: A = id < 3 (ids 1,2); B = id % 2 == 0 (2,4)
    df = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["doc_id"])
    out = {(r["method_a"], r["method_b"]): r for r in filter_agreement(
        df, {"a": F.col("doc_id") < 3,
             "b": F.col("doc_id") % 2 == 0}).collect()}
    r = out[("a", "b")]
    assert (r["n_both"], r["n_only_a"], r["n_only_b"], r["n_neither"]) \
        == (1, 1, 1, 1)
    assert r["jaccard"] == round(1 / 3, 6)


def test_filter_agreement_frame_flag_and_missing_ids(spark):
    from s3_redshift_backup_tool_spark.operators.text import (
        filter_agreement)
    # frame-valued flag missing id 3 -> treated as False (coalesce)
    df = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["doc_id"])
    fr = spark.createDataFrame([(1, True), (2, False)],
                               ["doc_id", "keep"])
    out = filter_agreement(df, {"col": F.col("doc_id") >= 1,
                                "frame": fr}).collect()
    r = out[0]
    assert (r["method_a"], r["method_b"]) == ("col", "frame")
    assert (r["n_both"], r["n_only_a"], r["n_only_b"], r["n_neither"]) \
        == (1, 2, 0, 0)


def test_filter_agreement_single_aggregate_plan(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.text import (
        filter_agreement, gopher_rules, quality_score,
        repetition_signals)
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    out = filter_agreement(docs, {
        "gopher": gopher_rules(docs, min_words=40)
        .select("doc_id", "gopher_keep"),
        "quality": quality_score(F.col("text")) >= 0.3,
        "repetition": repetition_signals(docs)
        .select("doc_id", "repetition_ok"),
    })
    rows = out.collect()
    assert len(rows) == 3
    n = docs.count()
    for r in rows:
        assert (r["n_both"] + r["n_only_a"] + r["n_only_b"]
                + r["n_neither"]) == n


# ----------------------------------------- epoch plan from weights

def test_epoch_plan_from_weights_matches_epoch_plan(spark):
    """Factoring check: temperature weights fed through
    epoch_plan_from_weights must reproduce epoch_plan exactly."""
    from s3_redshift_backup_tool_spark.operators.sampling import (
        epoch_plan, epoch_plan_from_weights)
    rows = [(i, ["a", "a", "b", "c"][i % 4], (i % 7 + 1) * 10.0)
            for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "dom", "tok"])
    full = {r["dom"]: r for r in
            epoch_plan(df, "dom", F.col("tok"), budget_ratio=2.0,
                       temperature=2.0, max_epochs=4.0).collect()}
    dom = spark.createDataFrame(
        [(d, r["tokens"], r["weight"]) for d, r in full.items()],
        ["dom", "tokens", "weight"])
    refac = {r["dom"]: r for r in
             epoch_plan_from_weights(dom, "dom", budget_ratio=2.0,
                                     max_epochs=4.0).collect()}
    for d in full:
        # raw_epochs recomputed from the ROUNDED weight: equal to 5dp
        assert abs(refac[d]["epochs"] - full[d]["epochs"]) < 1e-4
        assert refac[d]["capped"] == full[d]["capped"]


def test_doremi_epoch_composition_caps_and_budget(spark, sf_dir):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        doremi_weights, epoch_plan_from_weights)
    from s3_redshift_backup_tool_spark.operators.text import quality_score
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    w = doremi_weights(docs, "source",
                       1.0 - quality_score(F.col("text")),
                       F.size(F.split("text", " ")))
    plan = epoch_plan_from_weights(
        w.select("source", "tokens",
                 F.col("doremi_weight").alias("weight")), "source")
    rows = plan.collect()
    total = sum(r["tokens"] for r in rows)
    contributed = sum(r["tokens_contributed"] for r in rows)
    # contributed tokens never exceed the budget (2x corpus) and every
    # epochs value respects the cap
    assert contributed <= 2.0 * total + 1e-6
    for r in rows:
        assert r["epochs"] <= 4.0
        assert (r["raw_epochs"] > 4.0) == r["capped"]


# ------------------------------------- partitioning invariance

def test_new_selection_ops_partitioning_invariant(spark, sf_dir):
    """Determinism contract: every selection operator added this round
    must produce identical results regardless of input partitioning
    (the property that makes hash-gate pipelines rerun-stable)."""
    from s3_redshift_backup_tool_spark.operators.sampling import (
        doremi_weights, length_buckets, score_rank_by_group)
    from s3_redshift_backup_tool_spark.operators.text import quality_score
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    for mk in (
        lambda d: dsir_logratio(d, F.col("lang") == "en", n_buckets=256),
        lambda d: doremi_weights(d, "source",
                                 1.0 - quality_score(F.col("text")),
                                 F.size(F.split("text", " "))),
        lambda d: length_buckets(d, F.size(F.split("text", " "))),
        lambda d: score_rank_by_group(d, "source",
                                      quality_score(F.col("text"))),
    ):
        assert snap(mk(docs.repartition(7))) == snap(mk(docs.repartition(13)))


# ----------------------------------------------------- UniMax

def test_unimax_water_filling_hand_case(spark):
    """3 domains, tokens 10/20/100, cap = 4 epochs, budget = 2x corpus
    = 260. Uniform share 260/3 = 86.67: cap(a)=40 saturates; then
    (260-40)/2 = 110: cap(b)=80 saturates; c takes the remaining 140
    (1.4 epochs). Budget fully spent, no domain over 4 epochs."""
    from s3_redshift_backup_tool_spark.operators.sampling import (
        unimax_epochs)
    rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 100.0)]
    df = spark.createDataFrame(rows, ["id", "dom", "tok"])
    got = {r["dom"]: r for r in
           unimax_epochs(df, "dom", "tok").collect()}
    assert got["a"]["saturated"] and got["a"]["alloc_tokens"] == 40.0
    assert got["b"]["saturated"] and got["b"]["alloc_tokens"] == 80.0
    assert not got["c"]["saturated"]
    assert got["c"]["alloc_tokens"] == 140.0
    assert got["c"]["epochs"] == 1.4
    assert sum(r["alloc_tokens"] for r in got.values()) == 260.0


def test_unimax_no_saturation_is_uniform(spark):
    # equal large domains under a loose cap: everyone gets B/k exactly
    from s3_redshift_backup_tool_spark.operators.sampling import (
        unimax_epochs)
    rows = [(i, f"d{i}", 100.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["id", "dom", "tok"])
    got = unimax_epochs(df, "dom", "tok", budget_ratio=1.0).collect()
    for r in got:
        assert not r["saturated"]
        assert r["alloc_tokens"] == 100.0 and r["epochs"] == 1.0


def test_unimax_all_saturate_leaves_budget_unspent(spark):
    # budget far above total capacity: every domain caps at 4 epochs
    from s3_redshift_backup_tool_spark.operators.sampling import (
        unimax_epochs)
    rows = [(1, "a", 10.0), (2, "b", 30.0)]
    df = spark.createDataFrame(rows, ["id", "dom", "tok"])
    got = {r["dom"]: r for r in
           unimax_epochs(df, "dom", "tok", budget_ratio=10.0).collect()}
    assert all(r["saturated"] for r in got.values())
    assert got["a"]["epochs"] == 4.0 and got["b"]["epochs"] == 4.0


def test_unimax_fairer_than_temperature(spark, sf_dir):
    """The UniMax property vs temperature: UniMax equalizes ALLOCATED
    TOKENS (not epochs — epochs scale as 1/domain-size when nothing
    saturates), so the max/min allocated-token ratio across domains
    is never larger than temperature epoch_plan's tokens_contributed
    ratio on the same corpus, and is exactly 1 when no domain hits
    the epoch cap."""
    from s3_redshift_backup_tool_spark.operators.sampling import (
        epoch_plan, unimax_epochs)
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    tok = F.size(F.split("text", " "))
    uni = unimax_epochs(docs, "source", tok).collect()
    tmp = [r["tokens_contributed"] for r in
           epoch_plan(docs, "source", tok).collect()]
    ua = [r["alloc_tokens"] for r in uni]
    assert max(ua) / min(ua) <= max(tmp) / min(tmp) + 1e-9
    if not any(r["saturated"] for r in uni):
        assert abs(max(ua) - min(ua)) < 1e-6
    # budget exactly spent when not everything saturates
    total = sum(r["tokens"] for r in uni)
    assert abs(sum(ua) - 2.0 * total) < 1e-3
