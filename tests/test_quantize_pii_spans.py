"""Unit tests for the round-3 curation operators: int8 quantization,
chunk-level dup-span detection, PII scrubbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.dedup import dup_span_chunks
from s3_redshift_backup_tool_spark.operators.similarity import quantize_int8
from s3_redshift_backup_tool_spark.operators.text import pii_counts, scrub_pii


def test_quantize_int8_bounds_and_error(spark, embeddings):
    out = quantize_int8(embeddings.limit(50))
    joined = out.join(embeddings.select("vec_id", "embedding"), "vec_id")
    checks = joined.select(
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("max_q"),
        # max reconstruction error over elements, in units of scale
        F.array_max(F.zip_with(
            "embedding", "q",
            lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale"))
            / F.col("scale"))).alias("max_rel_err"),
    ).collect()
    for r in checks:
        assert r["max_q"] <= 127
        assert r["max_rel_err"] <= 0.5 + 1e-9  # round() error bound


def test_quantize_int8_is_narrow(spark, embeddings):
    plan = quantize_int8(embeddings)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: per-row math only


def test_dup_span_chunks_finds_shared_boilerplate(spark):
    chunk = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, chunk + " unique one two three four five six seven eight nine "
          "ten eleven twelve thirteen fourteen fifteen"),
         (2, chunk + " other a b c d e f g h i j k l m n o"),
         (3, "totally different words " + " ".join(f"x{i}" for i in range(20))),
         (4, "short doc")],  # < 16 words: emits nothing
        "doc_id long, text string")
    out = dup_span_chunks(docs, chunk_words=16, min_docs=2).collect()
    assert len(out) == 1  # exactly the shared leading chunk
    assert out[0]["n_docs"] == 2 and out[0]["n_occurrences"] == 2


def test_dup_span_respects_chunk_boundaries(spark):
    # same 16 words but offset by one position -> different chunks, no dup
    words = [f"w{i}" for i in range(17)]
    docs = spark.createDataFrame(
        [(1, " ".join(words[:16])), (2, " ".join(words[1:17]))],
        "doc_id long, text string")
    assert dup_span_chunks(docs, chunk_words=16).count() == 0


def test_scrub_pii_redacts_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "reach me at jane.doe+spam@mail.example.org or +1 (555) 123-4567 "
          "from host 192.168.0.1 thanks"),
         (2, "no pii here at all")],
        "id long, text string")
    out = df.select(
        "id", scrub_pii(F.col("text")).alias("s"),
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()]).collect()
    byid = {r["id"]: r for r in out}
    assert byid[1]["email"] == 1 and byid[1]["phone"] == 1 and byid[1]["ipv4"] == 1
    s = byid[1]["s"]
    assert "<EMAIL>" in s and "<PHONE>" in s and "<IPV4>" in s
    assert "jane" not in s and "555" not in s and "192.168" not in s
    assert byid[2]["s"] == "no pii here at all"


def test_scrub_pii_email_not_eaten_by_phone(spark):
    # digit-heavy email local part must redact as EMAIL, not PHONE
    df = spark.createDataFrame([(1, "mail 0123456789@nums.example.com now")],
                               "id long, text string")
    s = df.select(scrub_pii(F.col("text")).alias("s")).first()["s"]
    assert s == "mail <EMAIL> now"


def test_quantize_int8_zero_vector_is_zeros(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    r = quantize_int8(df).first()
    assert list(r["q"]) == [0, 0, 0] and r["q_l2sq"] == 0


def test_interleave_bits_injective_batch(spark):
    """One Spark pass over 4096 (x, y) pairs: distinct pairs -> distinct
    z keys (bit interleaving is a bijection onto 2*bits-bit ints)."""
    from s3_redshift_backup_tool_spark.operators.layout import interleave_bits
    df = (spark.range(64).withColumnRenamed("id", "x")
          .crossJoin(spark.range(64).withColumnRenamed("id", "y")))
    n = (df.select(interleave_bits([F.col("x"), F.col("y")], bits=6)
           .alias("z")).distinct().count())
    assert n == 64 * 64


def test_scrub_pii_is_idempotent_batch(spark, documents):
    """scrub(scrub(x)) == scrub(x): placeholders never re-match (one
    corpus pass + synthetic PII rows)."""
    base = documents.limit(50).select(
        F.concat(F.col("text"), F.lit(" a@b.co +1 23456789 1.2.3.4"))
        .alias("t"))
    once = base.select(scrub_pii(F.col("t")).alias("s1"))
    both = once.select("s1", scrub_pii(F.col("s1")).alias("s2"))
    assert both.filter(F.col("s1") != F.col("s2")).count() == 0


def test_pack_ids_unique_across_buckets(spark, documents):
    """Shift-40 stride: a (bucket, pack_id) pair determines pack_id
    globally — no two buckets may share a pack id (the r2 advisor
    finding on the old decimal stride)."""
    from s3_redshift_backup_tool_spark.operators.sampling import pack_sequences
    out = pack_sequences(documents, "doc_id", F.size(F.split("text", " ")),
                         budget=64, buckets=32)
    per_id = out.groupBy("pack_id").agg(
        F.countDistinct("bucket").alias("nb"))
    assert per_id.filter(F.col("nb") > 1).count() == 0
    assert out.select("bucket").distinct().count() > 1  # test has teeth
