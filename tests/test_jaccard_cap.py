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


def test_capped_overlap_is_lower_bound_subset(spark, documents):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        overlap_coefficient_pairs,
    )
    docs = documents.limit(200)
    full = {(r["id_a"], r["id_b"]): r["overlap"]
            for r in overlap_coefficient_pairs(
                docs, n=3, threshold=0.0).collect()}
    capped = {(r["id_a"], r["id_b"]): r["overlap"]
              for r in overlap_coefficient_pairs(
                  docs, n=3, threshold=0.0, max_doc_freq=5).collect()}
    assert len(full) > 0
    # stop-shingles leave the numerator only: every capped pair exists
    # uncapped with overlap <= the exact value (min-size denominator is
    # computed from the UNCAPPED sets on purpose)
    for pair, ov in capped.items():
        assert pair in full
        assert ov <= full[pair] + 1e-9


def test_cap_of_zero_prunes_everything(spark, documents):
    out = ngram_jaccard_pairs(documents.limit(50), n=3, threshold=0.0,
                              max_doc_freq=0)
    assert out.count() == 0


def test_lsh_max_bucket_size_drops_degenerate_buckets(spark):
    """The degenerate-bucket guard: identical docs all land in one giant
    band bucket; with the cap below the clique size those pairs vanish,
    while an unrelated small near-dup pair survives."""
    from s3_redshift_backup_tool_spark.operators.dedup import lsh_pairs

    boiler = "the same boilerplate template page " * 6
    rows = [(i, boiler) for i in range(20)]                  # giant bucket
    rows += [(100, "a genuinely unique document about owls and rivers"),
             (101, "a genuinely unique document about owls and rivers")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r["id_a"], r["id_b"]) for r in lsh_pairs(docs).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in lsh_pairs(docs, max_bucket_size=10).collect()}
    assert (100, 101) in full and (100, 101) in capped
    assert any(a < 20 and b < 20 for a, b in full)       # clique pairs exist
    assert not any(a < 20 and b < 20 for a, b in capped)  # ...and are dropped
    assert capped <= full


def test_overlap_coefficient_finds_containment_jaccard_misses(spark):
    """A short doc quoted inside a long one: overlap ~1.0, jaccard tiny."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        ngram_jaccard_pairs, overlap_coefficient_pairs,
    )
    short = " ".join(f"q{i}" for i in range(12))
    long_ = " ".join(f"w{i}" for i in range(200)) + " " + short
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id int, text string")
    ov = overlap_coefficient_pairs(docs, n=3, threshold=0.8).collect()
    assert len(ov) == 1 and ov[0]["overlap"] >= 0.99
    jc = ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    assert jc == []                     # invisible to jaccard


def test_lsh_bipartite_no_within_side_pairs_and_estimates(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        lsh_bipartite_pairs,
    )
    span = " ".join(f"s{i}" for i in range(40))
    ev = spark.createDataFrame(
        [(1, span), (2, " ".join(f"e{i}" for i in range(40)))],
        "doc_id int, text string")
    tr = spark.createDataFrame(
        [(10, span),                                   # exact copy of 1
         (11, span + " tail extra words here now"),    # near copy of 1
         (12, " ".join(f"t{i}" for i in range(40)))],  # unrelated
        "doc_id int, text string")
    out = {(r["eval_id"], r["train_id"]): r["est_jaccard"]
           for r in lsh_bipartite_pairs(ev, tr, num_hashes=16,
                                        bands=8).collect()}
    assert out[(1, 10)] == 1.0                         # exact copy
    assert (1, 11) in out and out[(1, 11)] >= 0.5      # near copy
    assert all(e in (1, 2) and t in (10, 11, 12) for e, t in out)
    assert (2, 12) not in out and (1, 12) not in out


def test_lsh_bipartite_bucket_cap_drops_degenerate(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        lsh_bipartite_pairs,
    )
    boiler = " ".join(f"b{i}" for i in range(30))
    ev = spark.createDataFrame([(i, boiler) for i in range(5)],
                               "doc_id int, text string")
    tr = spark.createDataFrame([(100 + i, boiler) for i in range(5)],
                               "doc_id int, text string")
    full = lsh_bipartite_pairs(ev, tr).count()
    capped = lsh_bipartite_pairs(ev, tr, max_bucket_size=2).count()
    assert full == 25 and capped == 0


def test_prefix_filter_equals_inverted_index(spark):
    """PPJoin prefix filtering returns the EXACT same pairs as the
    full inverted-index join, at several thresholds."""
    import random
    from s3_redshift_backup_tool_spark.operators.dedup import (
        jaccard_prefix_filter_pairs, ngram_jaccard_pairs,
    )
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    base = rng.sample(vocab, 30)
    for i in range(12):
        words = list(base)
        for _ in range(rng.randrange(0, 14)):      # mutate a few words
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    for t in (0.3, 0.5, 0.8):
        want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
                ngram_jaccard_pairs(df, n=3, threshold=t).collect()}
        got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
               jaccard_prefix_filter_pairs(df, n=3,
                                           threshold=t).collect()}
        assert got == want and (t > 0.7 or want)
