"""Content-defined chunking + multi-epoch budget planner."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.dedup import (
    content_defined_chunks)
from s3_redshift_backup_tool_spark.operators.sampling import epoch_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_chunks_partition_the_document(spark):
    # every word lands in exactly one chunk: lengths sum to the word
    # count and chunk_ids are contiguous from 1
    text = " ".join(f"w{i}" for i in range(200))
    ch = content_defined_chunks(
        _docs(spark, [(1, "a", text)]), divisor=8).collect()
    assert sum(r["chunk_words"] for r in ch) == 200
    assert sorted(r["chunk_id"] for r in ch) == list(
        range(1, len(ch) + 1))
    assert len(ch) > 1  # divisor 8 over 200 words must cut somewhere


def test_chunks_are_shift_robust(spark):
    # PREPENDING words must leave every chunk after the first
    # content-defined boundary with an identical fingerprint —
    # the property fixed-width chunking cannot give
    base = " ".join(f"tok{i}" for i in range(300))
    shifted = "zzz qqq " + base
    ch = content_defined_chunks(
        _docs(spark, [(1, "a", base), (2, "a", shifted)]), divisor=8)
    fps = {r["doc_id"]: set() for r in ch.select("doc_id").distinct()
           .collect()}
    rows = ch.collect()
    for r in rows:
        fps[r["doc_id"]].add(r["fingerprint"])
    shared = fps[1] & fps[2]
    n1 = len(fps[1])
    # all but the first (boundary-straddling) chunk survive the shift
    assert len(shared) >= n1 - 2, (n1, len(shared))


def test_chunk_determinism_and_expected_size(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    a = content_defined_chunks(docs).agg(
        F.count(F.lit(1)), F.sum("chunk_words")).collect()[0]
    b = content_defined_chunks(docs).agg(
        F.count(F.lit(1)), F.sum("chunk_words")).collect()[0]
    assert a == b
    total_words = docs.filter(F.col("text").isNotNull()).agg(
        F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert a[1] == total_words  # partition property on real data
    # mean chunk length ~ divisor (8): loose sanity band
    assert 3.0 < a[1] / a[0] < 16.0


def test_epoch_plan_values_and_cap(spark):
    # two domains, 100 vs 400 tokens (1 doc each, explicit counts);
    # T=2 -> weights 10/30, 20/30; budget = 2*500 = 1000
    # raw: big = 1000*(2/3)/400 = 5/3 ; small = 1000*(1/3)/100 = 10/3
    df = _docs(spark, [(1, "small", " ".join(["x"] * 100)),
                       (2, "big", " ".join(["y"] * 400))])
    out = {r["source"]: r for r in
           epoch_plan(df, "source", F.size(F.split("text", " ")),
                      budget_ratio=2.0, temperature=2.0,
                      max_epochs=4.0).collect()}
    assert out["small"]["weight"] == round(1 / 3, 6)
    assert out["big"]["raw_epochs"] == round(5 / 3, 6)
    assert out["small"]["raw_epochs"] == round(10 / 3, 6)
    assert not out["small"]["capped"] and not out["big"]["capped"]
    # shrink the small domain so its raw epochs exceed the cap
    df2 = _docs(spark, [(1, "small", " ".join(["x"] * 10)),
                        (2, "big", " ".join(["y"] * 490))])
    out2 = {r["source"]: r for r in
            epoch_plan(df2, "source", F.size(F.split("text", " "))).collect()}
    assert out2["small"]["capped"] and out2["small"]["epochs"] == 4.0
    assert out2["small"]["tokens_contributed"] == 40.0
