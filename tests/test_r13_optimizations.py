"""Value-equality pins for the r13 optimization-round rewrites.

Every change this round is a plan-shape optimization that must be
value-IDENTICAL to the shape it replaced; these tests pin each one
against the unoptimized form (or a from-first-principles construction)
so later refactors cannot drift the semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.graph import (
    kcore_peel, pagerank, triangle_stats)
from s3_redshift_backup_tool_spark.operators.sampling import (
    sample_by_hash, sample_by_hash_complement)


def test_sample_complement_is_exact_partition(spark, documents):
    """complement == anti-join of the sample, and the two sides form a
    disjoint, exhaustive partition (the decontamination split
    contract)."""
    train = sample_by_hash(documents, "doc_id", 0.8)
    evald = sample_by_hash_complement(documents, "doc_id", 0.8)
    anti = documents.join(train.select("doc_id"), "doc_id", "left_anti")
    got = {r["doc_id"] for r in evald.select("doc_id").collect()}
    want = {r["doc_id"] for r in anti.select("doc_id").collect()}
    assert got == want and len(got) > 0
    n_train = train.count()
    assert n_train + len(got) == documents.count()
    assert not ({r["doc_id"] for r in train.select("doc_id").collect()}
                & got)


def test_sample_complement_salt_and_bounds(spark, documents):
    """Salted complements partition the salted sample, and rate bounds
    are validated like sample_by_hash's."""
    import pytest

    a = sample_by_hash(documents, "doc_id", 0.3, salt="s1")
    b = sample_by_hash_complement(documents, "doc_id", 0.3, salt="s1")
    assert a.count() + b.count() == documents.count()
    with pytest.raises(ValueError):
        sample_by_hash_complement(documents, "doc_id", 1.5)


def test_pagerank_pairs_distinct_equals_default(spark):
    """pairs_distinct=True (dedup shuffle skipped, deg pre-joined,
    dangling left-join dropped) must reproduce the default path's ranks
    exactly on an already-distinct id_a < id_b pair relation."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11), (1, 2), (2, 3)],
        "id_a long, id_b long")
    base = {r["node"]: r["rank"] for r in pagerank(pairs, iters=3).collect()}
    fast = {r["node"]: r["rank"]
            for r in pagerank(pairs, iters=3, pairs_distinct=True).collect()}
    assert base == fast


def test_kcore_pairs_distinct_equals_default(spark):
    pairs = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(5, 6)],
        "id_a long, id_b long")
    base = {(r["node"], r["core_deg"])
            for r in kcore_peel(pairs, k=2, rounds=3).collect()}
    fast = {(r["node"], r["core_deg"])
            for r in kcore_peel(pairs, k=2, rounds=3,
                                pairs_distinct=True).collect()}
    assert base == fast and len(base) > 0


def test_triangle_stats_empty_graph(spark):
    """The single-action scalar fold must keep the empty-graph contract
    (0 nodes / 0 edges / 0 triangles, NULL transitivity) that the
    previous three-action form produced."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    r = triangle_stats(empty).first()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (0, 0, 0)
    assert r["transitivity"] is None


def test_fk_orphan_audit_one_pass_semantics(spark):
    """One-pass fk_orphan_audit (left join vs distinct dim keys + single
    aggregate) must keep the three-action form's contract: NULL fact
    keys counted separately from orphans, duplicate dim keys never
    multiply fact rows, empty facts give rate 0.0."""
    from s3_redshift_backup_tool_spark.operators.quality import (
        fk_orphan_audit)

    facts = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (1,), (2,)], "d long")  # dup key 1
    r = fk_orphan_audit(facts, "k", dim, "d").first()
    assert (r["n_rows"], r["n_null_keys"], r["n_orphans"]) == (6, 2, 1)
    assert r["orphan_rate"] == round(1 / 6, 6)

    empty = spark.createDataFrame([], "k long")
    r0 = fk_orphan_audit(empty, "k", dim, "d").first()
    assert (r0["n_rows"], r0["n_orphans"], r0["orphan_rate"]) == (0, 0, 0.0)


def test_kn_vocab_from_types_equals_corpus_scan(spark):
    """kn_bigram_perplexity derives V from the bigram-types table; the
    identity it relies on — every token of a >=2-token doc is some
    bigram's w1 or w2 — must hold, including for docs filtered out by
    the >=2 gate (their tokens never counted before either)."""
    from s3_redshift_backup_tool_spark.operators.text import (
        kn_bigram_perplexity)

    docs = spark.createDataFrame(
        [(0, "a b c a"), (2, "b d"), (4, "solo"),  # train: %2 == 0
         (1, "a b x"), (3, "q")],                   # test:  %2 == 1
        "doc_id long, text string")
    # train tokens over >=2-token docs: {a, b, c, d} (doc 4 gated out)
    # distinct train bigrams: (a,b),(b,c),(c,a),(b,d) -> D = 4, V = 4
    out = {r["doc_id"]: r for r in kn_bigram_perplexity(docs).collect()}
    assert set(out) == {1}  # doc 3 has < 2 tokens
    r = out[1]
    assert r["n_bigrams"] == 2
    # (a,b) seen: max(1-.75,0)/1 + .75*(1/1)*((1+1)/(4+4+1)) = 0.41(6)
    # (b,x) unseen w2, seen ctx b (c1=2, n1f=2):
    #   0 + .75*(2/2)*((0+1)/9) = 0.08(3)
    import math
    p1 = 0.25 / 1 + 0.75 * 1 / 1 * (1 + 1) / (4 + 4 + 1)
    p2 = 0.75 * (2 / 2) * (0 + 1) / (4 + 4 + 1)
    want = round((math.log(p1) + math.log(p2)) / 2, 6)
    assert abs(r["avg_logprob"] - want) < 1e-9


def test_curation_attrition_cap_identity(spark, documents):
    """The windowless per-source cap count (sum of least(n, 20)) must
    equal the row_number()<=20 window form it replaced."""
    from pyspark.sql.window import Window
    from s3_redshift_backup_tool_spark.operators import text as tx

    keep = tx.gopher_keep_expr(F.col("text"), min_words=40)
    g = documents.filter(keep)
    canon = (g.groupBy(F.md5(tx.normalize_text(F.col("text"))).alias("h"))
              .agg(F.min("doc_id").alias("doc_id")))
    canon_src = canon.join(documents.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy("doc_id")
    windowed = (canon_src.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") <= 20).count())
    folded = (canon_src.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .agg(F.coalesce(F.sum(F.least(F.col("n"), F.lit(20))),
                              F.lit(0)).alias("c")).first()["c"])
    assert folded == windowed


def test_overlap_report_zero_hit_docs_present(spark):
    """One-pass overlap report: eval docs with ZERO train overlap must
    still appear with n_overlap = 0 (the left-join + count(__hit)
    replacement for the semi-join + outer-join shape)."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        decontaminate_overlap)

    evald = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally disjoint vocabulary here too friend")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            decontaminate_overlap(evald, train, threshold=0.5).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_overlap"] == rows[1]["n_shingles"] > 0
    assert rows[1]["contaminated"] is True
    assert rows[2]["n_overlap"] == 0
    assert rows[2]["overlap_frac"] == 0.0
    assert rows[2]["contaminated"] is False
