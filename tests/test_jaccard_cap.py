"""Jaccard stop-shingle cap: conservative pruning of boilerplate skew."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.operators.dedup import ngram_jaccard_pairs


def test_capped_jaccard_is_lower_bound_subset(spark, documents):
    docs = documents.limit(200)
    # threshold 0: any pair sharing at least one shingle (sample-robust)
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                                           max_doc_freq=5).collect()}
    assert len(full) > 0
    # every capped pair exists uncapped, with jaccard <= the exact value
    for pair, j in capped.items():
        assert pair in full
        assert j <= full[pair] + 1e-9


def test_cap_of_zero_prunes_everything(spark, documents):
    out = ngram_jaccard_pairs(documents.limit(50), n=3, threshold=0.0,
                              max_doc_freq=0)
    assert out.count() == 0
