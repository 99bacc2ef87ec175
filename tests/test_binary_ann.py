"""Binary sign quantization + Hamming ANN + multi-index SimHash pairs.

Correctness model:
- binary_quantize's packed words must equal a Python bit-pack of the
  same vectors (the driver-side twin pack_sign_words IS that reference,
  so the two are cross-checked against each other on real data).
- ann_hamming_topk's Hamming distances must equal brute-force popcount
  over the unpacked sign patterns; the rerank path must equal exact
  cosine over the Hamming shortlist.
- simhash_hamming_pairs (chunk inverted index, Manku'07) must equal the
  all-pairs O(n^2) definition — the pigeonhole argument made executable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators import dedup as dd
from s3_redshift_backup_tool_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    return read_table(spark, sf_dir, "embeddings").cache()


def test_binary_quantize_matches_python_pack(emb):
    rows = emb.select("vec_id", "embedding").collect()
    expect = {r["vec_id"]: sim.pack_sign_words(
        [float(v) for v in r["embedding"]]) for r in rows}
    got = sim.binary_quantize(emb, dim=64).collect()
    assert len(got) == len(expect)
    for r in got:
        w = expect[r["vec_id"]]
        assert (r["w0"], r["w1"]) == (w[0], w[1])
        assert r["set_bits"] == bin(w[0]).count("1") + bin(w[1]).count("1")


def test_binary_quantize_zero_and_negative_coords(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [-1.0] * 64), (3, [1.0] * 64),
         (4, [1.0, -1.0] * 32), (5, [float("nan")] * 64),
         (6, [float("nan"), 1.0] * 32)],
        "vec_id int, embedding array<float>")
    out = {r["vec_id"]: r for r in sim.binary_quantize(df, dim=64).collect()}
    # 0.0 is NOT > 0: zero and all-negative vectors pack to zero words
    assert (out[1]["w0"], out[1]["w1"], out[1]["set_bits"]) == (0, 0, 0)
    assert (out[2]["w0"], out[2]["w1"], out[2]["set_bits"]) == (0, 0, 0)
    assert (out[3]["w0"], out[3]["w1"]) == (0xFFFFFFFF, 0xFFFFFFFF)
    assert out[3]["set_bits"] == 64
    # alternating +,- starting at dim 1 -> even bits set in each word
    assert out[4]["w0"] == out[4]["w1"] == 0x55555555
    assert out[4]["set_bits"] == 32
    # NaN is a 0-bit on BOTH the column expr (explicit isnan guard —
    # Spark's bare `NaN > 0` is true) and the Python twin (nan > 0 is
    # False); without the guard rows 5/6 desynchronize the two packings
    for vid in (5, 6):
        vec = [float("nan")] * 64 if vid == 5 else [float("nan"), 1.0] * 32
        w = sim.pack_sign_words(vec)
        assert (out[vid]["w0"], out[vid]["w1"]) == (w[0], w[1])
    assert out[5]["set_bits"] == 0
    assert out[6]["w0"] == out[6]["w1"] == 0xAAAAAAAA


def test_hamming_rerank_drops_zero_norm_candidates(spark):
    # an all-zero vector packs to zero words, so a near-zero query puts
    # it at the TOP of the Hamming shortlist; its cosine is 0/0 = NaN,
    # which Spark orders greatest — without the guard it would win the
    # exact rerank with an undefined similarity
    rows = [(0, [0.0] * 63 + [-1.0])]                 # degenerate-ish query
    rows += [(1, [0.0] * 64)]                         # zero-norm candidate
    rows += [(i, [float((i * 7 + j) % 5 - 2) for j in range(64)])
             for i in range(2, 30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = [0.0] * 63 + [-1.0]
    got = sim.ann_hamming_topk(df, q, k=5, rerank=10, dim=64).collect()
    ids = [r["vec_id"] for r in got]
    assert 1 not in ids
    assert all(r["cos_sim"] == r["cos_sim"] for r in got)  # no NaN


def test_simhash_bits_64_sign_safe(spark):
    # bits=64 exercises the sign bit's Long.MIN_VALUE weight; plan
    # construction used to fail (1 << 63 > Long.MAX_VALUE as a literal)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id int, text string")
    sigs = {r["doc_id"]: r["simhash"]
            for r in dd.simhash(df, bits=64).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    # identical docs at Hamming 0 survive the 64-bit multi-index
    pairs = dd.simhash_hamming_pairs(df, bits=64, radius=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_simhash_rejects_out_of_range_bits():
    with pytest.raises(ValueError):
        dd.simhash(None, bits=65)
    with pytest.raises(ValueError):
        dd.simhash(None, bits=0)


def test_hamming_topk_matches_bruteforce(emb):
    rows = emb.select("vec_id", "embedding").collect()
    q = next([float(v) for v in r["embedding"]]
             for r in rows if r["vec_id"] == 0)
    qw = sim.pack_sign_words(q)
    brute = sorted(
        (sum(bin(a ^ b).count("1") for a, b in
             zip(sim.pack_sign_words([float(v) for v in r["embedding"]]), qw)),
         r["vec_id"])
        for r in rows)[:10]
    got = sim.ann_hamming_topk(emb, q, k=10, dim=64).collect()
    assert [(r["hamming"], r["vec_id"]) for r in got] == brute


def test_hamming_rerank_matches_exact_cosine_over_shortlist(emb):
    import math
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    q = vecs[0]
    qw = sim.pack_sign_words(q)
    short = sorted(
        (sum(bin(a ^ b).count("1") for a, b in
             zip(sim.pack_sign_words(v), qw)), vid)
        for vid, v in vecs.items())[:50]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return round(sum(a * b for a, b in zip(v, q))
                     / (math.sqrt(sum(x * x for x in v)) * qn), 6)

    expect = sorted(((-cos(vecs[vid]), vid) for _, vid in short))[:10]
    got = sim.ann_hamming_topk(emb, q, k=10, rerank=50, dim=64).collect()
    assert [(-r["cos_sim"], r["vec_id"]) for r in got] == pytest.approx(
        [(c, v) for c, v in expect])


def test_hamming_topk_plan_is_topk_no_sort_shuffle(emb):
    plan = sim.ann_hamming_topk(emb, [1.0] * 64, k=10, dim=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_simhash_hamming_pairs_equal_allpairs(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    idx = dd.simhash_hamming_pairs(docs, bits=32, radius=3)
    sigs = {r["doc_id"]: r["simhash"]
            for r in dd.simhash(docs, bits=32).collect()}
    ids = sorted(sigs)
    brute = {(a, b, bin(sigs[a] ^ sigs[b]).count("1"))
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in idx.collect()}
    assert got == brute
    assert brute, "fixture should contain near-dup pairs"


def test_simhash_hamming_pairs_plan_is_bucketed(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    docs = read_table(spark, sf_dir, "documents")
    plan = dd.simhash_hamming_pairs(docs, bits=32, radius=3) \
        ._jdf.queryExecution().executedPlan().toString()
    # candidate generation is the (ci, cv) equi-join, never a product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_hamming_pairs_rejects_indivisible_bits():
    with pytest.raises(ValueError):
        dd.simhash_hamming_pairs(None, bits=32, radius=2)  # 32 % 3 != 0
