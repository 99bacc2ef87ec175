"""Deterministic hash sampling / splitting properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.sampling import (
    sample_by_hash, split_by_hash)


def test_sample_is_deterministic_and_nested(spark, documents):
    s10 = {r["doc_id"] for r in
           sample_by_hash(documents, "doc_id", 0.10).select("doc_id").collect()}
    s10b = {r["doc_id"] for r in
            sample_by_hash(documents, "doc_id", 0.10).select("doc_id").collect()}
    s50 = {r["doc_id"] for r in
           sample_by_hash(documents, "doc_id", 0.50).select("doc_id").collect()}
    assert s10 == s10b                      # rerun-stable
    assert s10 <= s50                       # nested rates are supersets
    n = documents.count()
    assert 0 < len(s10) < len(s50) < n


def test_salt_decorrelates(spark, documents):
    a = {r["doc_id"] for r in
         sample_by_hash(documents, "doc_id", 0.3, salt="a").collect()}
    b = {r["doc_id"] for r in
         sample_by_hash(documents, "doc_id", 0.3, salt="b").collect()}
    assert a != b                           # independent gates


def test_split_is_disjoint_exhaustive(spark, documents):
    out = split_by_hash(documents, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    n = documents.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n        # exhaustive
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # one split per row (no leakage)
    assert out.select("doc_id").distinct().count() == n


def test_invalid_args_raise(spark, documents):
    with pytest.raises(ValueError):
        sample_by_hash(documents, "doc_id", 1.5)
    with pytest.raises(ValueError):
        split_by_hash(documents, "doc_id", {"a": 0.5, "b": 0.2})


def test_chunk_documents_boundaries_and_overlap(spark):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        chunk_documents)
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", max_tokens=4, stride=3)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"   # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    # short doc: one (possibly partial) chunk, never zero
    assert rows[(2, 0)]["chunk_text"] == "a b" and rows[(2, 0)]["n_tokens"] == 2
    # every token of doc 1 appears in at least one chunk
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered |= set(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest
    from s3_redshift_backup_tool_spark.operators.sampling import (
        chunk_documents)
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", max_tokens=4, stride=5)


# -- cluster-safe split -----------------------------------------------------

def test_cluster_safe_split_no_cluster_straddles(spark):
    """Every member of a dup cluster gets the representative's split;
    singletons gate on their own key (== plain split_by_hash)."""
    from s3_redshift_backup_tool_spark.operators.sampling import (
        cluster_safe_split, split_by_hash,
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint")
    # clusters: {0..9} -> 0, {50,51} -> 50; rest singleton
    comps = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(50, 50), (51, 50)],
        "doc_id bigint, component bigint")
    out = cluster_safe_split(
        docs, "doc_id", comps, {"train": 0.6, "val": 0.2, "test": 0.2})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len({rows[i] for i in range(10)}) == 1
    assert rows[50] == rows[51]
    # singleton rows match the plain hash split exactly
    plain = {r["doc_id"]: r["split"] for r in split_by_hash(
        docs, "doc_id", {"train": 0.6, "val": 0.2, "test": 0.2}).collect()}
    for i in range(60, 200):
        assert rows[i] == plain[i]
    # fractions are respected roughly (hash-uniform over 200 keys)
    from collections import Counter
    c = Counter(rows.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]


# -- constraint audit -------------------------------------------------------

def test_check_constraints_null_is_violation(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        check_constraints,
    )
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id int, price double")
    out = {r["constraint"]: (r["n_violations"], r["pass"])
           for r in check_constraints(df, [
               ("price_positive", F.col("price") > 0),
               ("id_small", F.col("id") < 100)]).collect()}
    # -5 fails, NULL fails (SQL CHECK semantics), 10 passes
    assert out["price_positive"] == (2, False)
    assert out["id_small"] == (0, True)


def test_fk_violations_counts_orphans(spark):
    from s3_redshift_backup_tool_spark.operators.quality import (
        fk_violations,
    )
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (9,)], "k int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = fk_violations(child, parent, "k", "pk").first()
    assert r["n_orphans"] == 2 and r["n_distinct_orphan_keys"] == 1


def test_weighted_sample_exact_k_properties(spark):
    from pyspark.sql import functions as F
    from s3_redshift_backup_tool_spark.operators.sampling import (
        weighted_sample_exact_k,
    )
    df = spark.createDataFrame(
        [(g, i, float(1 + (i % 7))) for g in ("a", "b") for i in range(50)]
        + [("a", 999, 0.0), ("b", 998, None)],     # excluded rows
        "g string, id int, w double")
    out = weighted_sample_exact_k(df, "g", 10, F.col("w"), "id")
    rows = out.collect()
    from collections import Counter
    per = Counter(r["g"] for r in rows)
    assert per == {"a": 10, "b": 10}               # exactly k per group
    assert all(r["id"] not in (999, 998) for r in rows)
    # deterministic: same call, same sample
    again = {(r["g"], r["id"]) for r in weighted_sample_exact_k(
        df, "g", 10, F.col("w"), "id").collect()}
    assert again == {(r["g"], r["id"]) for r in rows}
    # weight-proportional in aggregate: heavy rows (w>=6) appear more
    # often than their uniform share among winners
    heavy = sum(1 for r in rows if r["w"] >= 6.0)
    assert heavy >= 5                               # ~2/7 uniform -> ~5.7


def test_pack_manifests_boundaries_and_order(spark):
    from pyspark.sql import functions as F
    from s3_redshift_backup_tool_spark.operators.sampling import (
        hash_gate, pack_manifests, pack_sequences,
    )
    docs = spark.createDataFrame(
        [(i, 10 + (i % 5)) for i in range(60)], "doc_id bigint, n long")
    packed = pack_sequences(docs, "doc_id", F.col("n"),
                            budget=40, buckets=4)
    man = pack_manifests(packed)
    rows = man.collect()
    assert rows
    lens = {r["doc_id"]: r["n"] for r in docs.collect()}
    gates = {r["doc_id"]: r[1] for r in docs.select(
        "doc_id", hash_gate(F.col("doc_id"))).collect()}
    for r in rows:
        ids, b = r["member_ids"], r["boundaries"]
        assert r["n_docs"] == len(ids) == len(b)
        assert b[0] == 0
        # boundaries are the exclusive prefix sums of member lengths
        acc = 0
        for i, d in enumerate(ids):
            assert b[i] == acc
            acc += lens[d]
        assert r["total_tokens"] == acc
        # members ordered by the packing's own (hash, key) order
        keyed = [(gates[d], d) for d in ids]
        assert keyed == sorted(keyed)
    # every doc appears in exactly one pack
    all_ids = [d for r in rows for d in r["member_ids"]]
    assert sorted(all_ids) == list(range(60))


def test_temperature_keep_rates_properties(spark):
    """T=1 reproduces natural proportions (uniform rate target/total);
    higher T flattens toward uniform across groups (tail group rate
    rises, head falls); rates cap at 1."""
    import pytest
    from s3_redshift_backup_tool_spark.operators.sampling import (
        mixture_sample, temperature_keep_rates)
    rows = [(i, "big") for i in range(900)] + \
           [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    r1 = temperature_keep_rates(df, "grp", temperature=1.0,
                                target_rows=500)
    assert abs(r1["big"] - 0.5) < 1e-9 and abs(r1["small"] - 0.5) < 1e-9

    r4 = temperature_keep_rates(df, "grp", temperature=4.0,
                                target_rows=500)
    assert r4["small"] > r1["small"] and r4["big"] < r1["big"]

    # tiny group saturates at 1.0 under strong flattening + big target
    rinf = temperature_keep_rates(df, "grp", temperature=100.0,
                                  target_rows=900)
    assert rinf["small"] == 1.0

    with pytest.raises(ValueError, match="temperature"):
        temperature_keep_rates(df, "grp", temperature=0, target_rows=10)

    # end-to-end: realized sizes track the rates (hash gate is exact
    # in expectation; 900/100 rows give a loose band)
    kept = mixture_sample(df, "doc_id", "grp", r4, salt="t").groupBy(
        "grp").count().collect()
    got = {r["grp"]: r["count"] for r in kept}
    assert abs(got["big"] - 900 * r4["big"]) < 90
    assert abs(got["small"] - 100 * r4["small"]) < 30


def test_temperature_rates_null_groups_and_overflow(spark):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        temperature_keep_rates)
    rows = [(i, "a") for i in range(50)] + [(50 + i, None)
                                            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    r = temperature_keep_rates(df, "grp", temperature=1.0,
                               target_rows=25)
    assert set(r) == {"a"}           # NULL domain dropped, no TypeError

    # extreme temperature: linear space overflows, log-space fallback
    # keeps the ratios (equal-count groups -> equal rates)
    counts = {"x": 10**7, "y": 10**7}
    r2 = temperature_keep_rates(df, "grp", temperature=0.02,
                                target_rows=1000, counts=counts)
    assert abs(r2["x"] - r2["y"]) < 1e-12 and 0 < r2["x"] < 1


def test_temperature_mixture_parity_holds_with_null_sources(spark, tmp_path):
    """The registry entry and its DuckDB oracle must agree even when the
    corpus contains NULL sources (the driver fixture has none, so only
    this test pins the documented drop-NULL semantics end to end)."""
    import duckdb

    import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401
    from s3_redshift_backup_tool_spark.parity import REGISTRY

    rows = ([(i, "web", f"text {i}") for i in range(400)]
            + [(400 + i, "books", f"text {i}") for i in range(80)]
            + [(480 + i, None, f"text {i}") for i in range(40)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf = str(tmp_path / "sf_null")
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    spec = REGISTRY["temperature_mixture_by_source"]
    sdf = spec.fn(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    odf = con.execute(spec.oracle).fetchdf()
    con.close()
    assert sorted(sdf["doc_id"]) == sorted(odf["doc_id"])
    assert sdf["source"].notna().all()   # NULL domain gets no share


def test_plan_mixture_budget_and_realization(spark):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        mixture_sample, plan_mixture)

    rows = [(s * 1000 + i, f"dom{s}", "tok " * (10 * (s + 1)))
            for s in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r["source"]: r for r in plan_mixture(
        df, total_tokens=2000,
        weights={"dom0": 1.0, "dom1": 1.0, "dom2": 2.0,
                 "absent": 9.0}).collect()}
    # renormalized over PRESENT domains only: 0.25/0.25/0.5
    assert plan["dom0"]["weight"] == 0.25 and plan["dom2"]["weight"] == 0.5
    # budget conserved across targets
    assert abs(sum(p["target_tokens"] for p in plan.values()) - 2000) < 1
    # rate > 1 <=> source must repeat, and n_epochs = ceil(rate)
    for p in plan.values():
        import math
        assert p["n_epochs"] == math.ceil(p["sample_rate"])
    # sub-1 rates are directly realizable by mixture_sample
    realizable = {s: min(1.0, float(p["sample_rate"]))
                  for s, p in plan.items()}
    kept = mixture_sample(df, "doc_id", "source", realizable)
    assert 0 < kept.count() <= df.count()


def test_plan_mixture_rejects_negative_weight(spark):
    import pytest as _pt

    from s3_redshift_backup_tool_spark.operators.sampling import plan_mixture
    df = spark.createDataFrame([(1, "a", "x y")],
                               "doc_id long, source string, text string")
    with _pt.raises(ValueError, match="negative weight"):
        plan_mixture(df, 100, weights={"a": -1.0})


def test_epoch_shuffle_is_seeded_permutation(spark, documents):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        epoch_shuffle_ranks)

    n = documents.count()
    e7a = {r["doc_id"]: r["shuffle_rank"]
           for r in epoch_shuffle_ranks(documents, seed=7).collect()}
    e7b = {r["doc_id"]: r["shuffle_rank"]
           for r in epoch_shuffle_ranks(documents, seed=7).collect()}
    e8 = {r["doc_id"]: r["shuffle_rank"]
          for r in epoch_shuffle_ranks(documents, seed=8).collect()}
    assert sorted(e7a.values()) == list(range(1, n + 1))  # dense permutation
    assert e7a == e7b                                     # rerun-stable
    assert e8 != e7a                                      # seed reshuffles
    # and it is not the identity order
    assert any(e7a[d] != rank for rank, d in
               enumerate(sorted(e7a), start=1))
