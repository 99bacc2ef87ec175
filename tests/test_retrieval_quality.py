"""Round-4 operators: Gopher rule gate, BM25 retrieval, per-group
z-score outliers, importance-weighted sampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.quality import group_zscore_outliers
from s3_redshift_backup_tool_spark.operators.retrieval import bm25_topk
from s3_redshift_backup_tool_spark.operators.sampling import importance_sample
from s3_redshift_backup_tool_spark.operators.text import gopher_rules


# ---------------------------------------------------------------- gopher

def test_gopher_rules_known_doc(spark):
    good = "the cat sat on the mat and looked out of the window " * 5  # 60 words
    short = "tiny doc of no words"                     # fails word count
    symbols = "### " * 30 + "the a of it is in"        # symbol-heavy
    df = spark.createDataFrame(
        [(1, good.strip()), (2, short), (3, symbols.strip())],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            gopher_rules(df, min_words=40).collect()}
    assert rows[1]["gopher_keep"]
    assert not rows[2]["rule_word_count"] and not rows[2]["gopher_keep"]
    assert not rows[3]["rule_symbol_ratio"] and not rows[3]["gopher_keep"]
    assert rows[1]["n_words"] == 60
    assert rows[1]["stop_hits"] >= 2


def test_gopher_flags_are_conjunctive(spark, documents):
    out = gopher_rules(documents, min_words=40)
    bad = out.filter(
        F.col("gopher_keep") != (
            F.col("rule_word_count") & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio") & F.col("rule_alpha_words")
            & F.col("rule_stopwords"))).count()
    assert bad == 0
    # non-degenerate on the fixture: both kept and dropped docs exist
    kept = out.filter("gopher_keep").count()
    assert 0 < kept < out.count()


# ----------------------------------------------------------------- bm25

def test_bm25_hand_computed(spark):
    # 3 docs, query = [x]; df(x)=2, N=3, avgdl known
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y z w")], ["doc_id", "text"])
    out = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, ["x"], k=3).collect()}
    n, avgdl, k1, b = 3, (3 + 2 + 3) / 3.0, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(round(score(2, 3), 6), abs=1e-6)
    assert out[2] == pytest.approx(round(score(2 - 1, 2), 6), abs=1e-6)
    assert 3 not in out                     # no query term -> not scored
    assert out[2] > out[1] * 0 and len(out) == 2


def test_bm25_rare_term_outranks_common(spark, documents):
    # "spark" vs a guaranteed-common word: rarer terms carry higher idf,
    # so a doc matching only the rare term beats one matching only the
    # common term at equal tf/dl. Verify monotonicity on the idf itself.
    toks = F.split(F.col("text"), " ")
    n = documents.count()
    df_counts = {t: documents.filter(F.array_contains(toks, t)).count()
                 for t in ("spark", "row")}
    idf = {t: math.log(1 + (n - c + 0.5) / (c + 0.5))
           for t, c in df_counts.items()}
    assert (idf["spark"] > idf["row"]) == (df_counts["spark"] < df_counts["row"])
    out = bm25_topk(documents, ["spark", "row"], k=5).collect()
    assert len(out) == 5
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_query_raises(spark, documents):
    with pytest.raises(ValueError):
        bm25_topk(documents, [])


# ------------------------------------------------------------- z-score

def test_zscore_outliers_planted(spark):
    rows = [("a", float(v)) for v in [10] * 20] + [("a", 1000.0)] \
        + [("b", float(v)) for v in range(20)]   # b: no extreme point
    df = spark.createDataFrame(rows, ["grp", "val"]).withColumn(
        "rid", F.monotonically_increasing_id())
    out = group_zscore_outliers(df, "grp", "val", 3.0).collect()
    assert len(out) == 1
    assert out[0]["grp"] == "a" and out[0]["val"] == 1000.0
    assert out[0]["z"] > 3.0


def test_zscore_zero_variance_group_silent(spark):
    df = spark.createDataFrame([("a", 5.0), ("a", 5.0), ("a", 5.0)],
                               ["grp", "val"])
    assert group_zscore_outliers(df, "grp", "val", 1.0).count() == 0


# ------------------------------------------------- importance sampling

def test_importance_sample_extremes_and_rate(spark, documents):
    none = importance_sample(documents, "doc_id", F.lit(0.0)).count()
    all_ = importance_sample(documents, "doc_id", F.lit(1.0)).count()
    n = documents.count()
    assert none == 0 and all_ == n
    # weight clamping: out-of-range weights behave as 0/1
    assert importance_sample(documents, "doc_id", F.lit(-3.0)).count() == 0
    assert importance_sample(documents, "doc_id", F.lit(7.0)).count() == n
    # keep rate tracks the weight for a constant mid weight
    half = importance_sample(documents, "doc_id", F.lit(0.5)).count()
    assert 0.3 * n < half < 0.7 * n


def test_importance_sample_deterministic_and_weight_monotone(spark, documents):
    w_lo = F.lit(0.2)
    w_hi = F.lit(0.6)
    lo1 = {r["doc_id"] for r in
           importance_sample(documents, "doc_id", w_lo).select("doc_id").collect()}
    lo2 = {r["doc_id"] for r in
           importance_sample(documents, "doc_id", w_lo).select("doc_id").collect()}
    hi = {r["doc_id"] for r in
          importance_sample(documents, "doc_id", w_hi).select("doc_id").collect()}
    assert lo1 == lo2          # rerun-stable
    assert lo1 <= hi           # higher weight keeps a superset (same gate)


# ------------------------------------------------------------ sketches

def test_cms_never_undercounts_and_merges(spark, documents):
    from s3_redshift_backup_tool_spark.operators.sketches import (
        cms_estimate, cms_merge, cms_sketch)
    terms = ["join", "hash", "zzzz_absent"]
    sketch = cms_sketch(documents, depth=4, width=512)
    assert sketch.count() <= 4 * 512
    est = {r["term"]: r["cms_count"]
           for r in cms_estimate(sketch, terms).collect()}
    exact = {r["term"]: r["c"] for r in
             documents.select(F.explode(F.split("text", " ")).alias("t"))
             .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
             .filter(F.col("t").isin(terms))
             .withColumnRenamed("t", "term").collect()}
    for t in terms:
        assert est[t] >= exact.get(t, 0)     # one-sided error
    assert est["zzzz_absent"] < est["join"]  # collisions stay small

    # merge(delta sketches) == sketch(whole corpus), counter for counter
    half_a = documents.filter("doc_id % 2 = 0")
    half_b = documents.filter("doc_id % 2 = 1")
    merged = cms_merge(cms_sketch(half_a, depth=4, width=512),
                       cms_sketch(half_b, depth=4, width=512))
    full = {(r["d"], r["bucket"]): r["c"] for r in sketch.collect()}
    got = {(r["d"], r["bucket"]): r["c"] for r in merged.collect()}
    assert got == full


# ------------------------------------------------------ mixture sample

def test_mixture_sample_rates_and_nesting(spark, documents):
    from s3_redshift_backup_tool_spark.operators.sampling import mixture_sample
    n_src = {r["source"]: r["n"] for r in
             documents.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    out = mixture_sample(documents, "doc_id", "source",
                         {"src0": 1.0, "src1": 0.0}, default=0.5)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert by_src.get("src0") == n_src["src0"]     # weight 1 keeps all
    assert "src1" not in by_src                     # weight 0 drops all
    others = sum(v for k, v in by_src.items() if k not in ("src0", "src1"))
    total_others = sum(v for k, v in n_src.items() if k not in ("src0", "src1"))
    assert 0.3 * total_others < others < 0.7 * total_others

    # per-source nesting: 0.25 sample of a source is inside its 0.5 sample
    a = {r["doc_id"] for r in mixture_sample(
        documents, "doc_id", "source", {"src2": 0.25}, default=0.0)
        .select("doc_id").collect()}
    b = {r["doc_id"] for r in mixture_sample(
        documents, "doc_id", "source", {"src2": 0.5}, default=0.0)
        .select("doc_id").collect()}
    assert a <= b and len(a) < len(b)


# ------------------------------------------------------------ rrf fuse

def test_rrf_fusion_hand_computed(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], ["doc_id", "rank"])
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], topk=4).collect()}
    assert out[1] == round(1 / 61 + 1 / 62, 6)
    assert out[3] == round(1 / 63 + 1 / 61, 6)
    assert out[2] == round(1 / 62, 6)
    assert out[9] == round(1 / 63, 6)
    # doc in both lists outranks docs in one
    assert out[1] > out[2] and out[3] > out[9]


def test_rrf_topk_cut_deterministic(spark):
    from s3_redshift_backup_tool_spark.operators.retrieval import rrf_fuse
    # all same rank -> identical scores; cut must take lowest ids
    a = spark.createDataFrame([(i, 1) for i in range(10)],
                              ["doc_id", "rank"])
    ids = [r["doc_id"] for r in rrf_fuse([a], topk=3).collect()]
    assert ids == [0, 1, 2]


# --------------------------------------------- normalization + char LM

def test_normalize_catches_variant_dupes(spark):
    from s3_redshift_backup_tool_spark.operators.text import (
        md5_prefix_int, normalize_text)
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other doc")],
        ["doc_id", "text"])
    out = (df.select("doc_id",
                     md5_prefix_int(normalize_text(F.col("text")))
                     .alias("d"))
             .groupBy("d").count().collect())
    counts = sorted(r["count"] for r in out)
    assert counts == [1, 2]          # 1 and 2 collapse; 3 stands alone


def test_bigram_logprob_flags_divergent_text(spark):
    from s3_redshift_backup_tool_spark.operators.text import bigram_logprob
    typical = "the table row scan hash join merge sort filter value "
    rows = [(i, typical * 3) for i in range(8)]
    rows.append((99, "zq xj qz jx zz qq xx jj zq xj qz jx"))  # rare bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["avg_logprob"]
           for r in bigram_logprob(df).collect()}
    typical_scores = [v for k, v in out.items() if k != 99]
    assert out[99] < min(typical_scores)   # divergent doc scores lowest
    assert all(v < 0 for v in out.values())  # log-probs are negative
