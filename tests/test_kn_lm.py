"""Interpolated Kneser-Ney bigram perplexity (held-out split).

The tiny-corpus test hand-computes the KN arithmetic end to end; the
fixture tests pin the split semantics and the probability axioms.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators import text as tx


def test_kn_tiny_corpus_hand_computed(spark):
    # train = doc 0 "a b a b": big = {(a,b):2, (b,a):1}
    #   ctx: a -> c1=2, n1f=1 ; b -> c1=1, n1f=1
    #   cont: b -> 1 ; a -> 1 ; D=2 types, V={a,b}=2, denom = D+V+1 = 5
    # test = doc 1 "a b c":
    #   (a,b): max(2-.75,0)/2 + .75*(1/2)*((1+1)/5) = .625 + .15 = .775
    #   (b,c): 0/1 + .75*(1/1)*((0+1)/5) = .15
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string")
    rows = tx.kn_bigram_perplexity(df, discount=0.75).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    r = rows[0]
    assert r["n_bigrams"] == 2
    avg = (math.log(0.775) + math.log(0.15)) / 2
    assert r["avg_logprob"] == pytest.approx(round(avg, 6), abs=1e-6)
    assert r["perplexity"] == pytest.approx(round(math.exp(-avg), 4),
                                            abs=1e-4)


def test_kn_unseen_context_backs_off_to_continuation(spark):
    # doc 1 uses context "x" never seen in train -> P = Pcont(w2) alone
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "x a")], "doc_id long, text string")
    r = tx.kn_bigram_perplexity(df, discount=0.75).collect()[0]
    # Pcont(a) = (1+1)/5 = 0.4
    assert r["avg_logprob"] == pytest.approx(round(math.log(0.4), 6),
                                             abs=1e-6)


def test_kn_scores_only_held_out_docs(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    out = tx.kn_bigram_perplexity(docs)
    got_ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert got_ids, "fixture should have held-out docs"
    assert all(i % 2 == 1 for i in got_ids)
    expect = (docs.filter((F.col("doc_id") % 2 == 1)
                          & (F.size(F.split("text", " ")) >= 2)).count())
    assert len(got_ids) == expect


def test_kn_probability_axioms_on_fixture(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    out = tx.kn_bigram_perplexity(docs).collect()
    # every per-bigram p is in (0, 1], so mean log p <= 0 and ppl >= 1
    assert all(r["avg_logprob"] <= 0 for r in out)
    assert all(r["perplexity"] >= 1 for r in out)
    assert all(r["n_bigrams"] >= 1 for r in out)
