"""Persisted LSH dedup index: build -> incremental probe -> append.

The contract under test: index-probe + intra-batch pairs equal the
from-scratch lsh_pairs() result restricted to pairs touching the batch
— i.e. incremental dedup finds exactly the delta a full rerun would
add, without rescanning corpus text.
"""
from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators.dedup import (
    lsh_index_add, lsh_index_pairs, lsh_pairs, save_lsh_index)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_incremental_equals_restricted_full(spark, documents, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = documents.filter(F.col("doc_id") % 2 == 0)
    batch = documents.filter(F.col("doc_id") % 2 == 1)
    save_lsh_index(corpus, idx, n=3, num_hashes=16, bands=8)
    got = _pairs(lsh_index_pairs(spark, batch, idx,
                                 n=3, num_hashes=16, bands=8))
    full = _pairs(lsh_pairs(documents, n=3, num_hashes=16, bands=8))
    want = {(a, b) for a, b in full if a % 2 == 1 or b % 2 == 1}
    assert got == want and len(want) > 0


def test_index_side_never_shuffles(spark, documents, tmp_path):
    """The CDC-batch regime plan pin: batch bands broadcast, so the
    index scan feeds a BroadcastHashJoin directly — no Exchange between
    the index FileScan and the join."""
    idx = str(tmp_path / "idx")
    save_lsh_index(documents.limit(200), idx)
    plan = (lsh_index_pairs(spark, documents.limit(20), idx)
            ._jdf.queryExecution().executedPlan().toString())
    probe_join = [seg for seg in plan.split("BroadcastHashJoin")
                  if "Batched: true" in seg and "idx" in seg]
    assert "BroadcastHashJoin" in plan
    # the index FileScan appears under the broadcast join with no
    # shuffle Exchange between them
    scan_side = plan[plan.index("BroadcastHashJoin"):]
    assert probe_join or "Exchange hashpartitioning" not in \
        scan_side[:scan_side.index("Scan parquet") + 40]


def test_append_then_probe_sees_both_generations(spark, tmp_path):
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different content about maritime law")]
    gen2 = [(3, "the quick brown fox jumps over the lazy dog tonight")]
    batch = [(4, "the quick brown fox jumps over the lazy dog tomorrow"),
             (5, "unrelated text on astronomy and telescopes")]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    save_lsh_index(mk(rows), idx)
    lsh_index_add(spark, mk(gen2), idx)
    got = _pairs(lsh_index_pairs(spark, mk(batch), idx))
    assert (1, 4) in got and (3, 4) in got        # both generations hit
    assert not any(5 in p for p in got)


def test_resynced_doc_does_not_self_pair(spark, tmp_path):
    rows = [(1, "some document text that is long enough to shingle")]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    save_lsh_index(mk(rows), idx)
    got = _pairs(lsh_index_pairs(spark, mk(rows), idx))
    assert got == set()


def test_build_time_bucket_guard(spark, tmp_path):
    # 6 identical docs = one stop-bucket of width 6 in every band;
    # capped at build, the index carries nothing, so a probing dup
    # finds no pairs (recall-lower-bound contract, like lsh_pairs)
    rows = [(i, "boilerplate template page exactly the same text")
            for i in range(6)]
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    save_lsh_index(mk(rows), idx, max_bucket_size=5)
    probe = mk([(99, "boilerplate template page exactly the same text")])
    assert _pairs(lsh_index_pairs(spark, probe, idx)) == set()
    # uncapped control: the probe pairs with all six
    idx2 = str(tmp_path / "idx2")
    save_lsh_index(mk(rows), idx2)
    assert len(_pairs(lsh_index_pairs(spark, probe, idx2))) == 6


_doc = st.lists(st.sampled_from("red green blue cyan teal gold".split()),
                min_size=5, max_size=9).map(" ".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=4, max_size=14))
def test_incremental_contract_holds_on_random_corpora(spark, texts):
    """Property: for ANY corpus and ANY even/odd split, index-probe +
    intra-batch pairs == lsh_pairs(full) restricted to batch-touching
    pairs. The tiny vocabulary forces heavy near-dup collisions, the
    adversarial regime for bucket bookkeeping."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    idx = tempfile.mkdtemp(prefix="lsh_prop_")
    save_lsh_index(df.filter(F.col("doc_id") % 2 == 0), idx,
                   n=2, num_hashes=8, bands=4)
    got = _pairs(lsh_index_pairs(
        spark, df.filter(F.col("doc_id") % 2 == 1), idx,
        n=2, num_hashes=8, bands=4))
    full = _pairs(lsh_pairs(df, n=2, num_hashes=8, bands=4))
    assert got == {(a, b) for a, b in full if a % 2 == 1 or b % 2 == 1}


def test_capped_probe_equals_capped_fullscratch_delta(spark, documents,
                                                      tmp_path):
    """The incremental contract under the production cap: probe pairs
    with max_bucket_size must equal a capped from-scratch lsh_pairs run
    restricted to batch-touching pairs — the cap applies to the COMBINED
    index+batch bucket width, exactly the width the from-scratch run
    sees (r9 advice: only the build verb was capped; a capped build with
    an uncapped probe still hands a regrown stop-bucket l x r rows)."""
    idx = str(tmp_path / "idx")
    corpus = documents.filter(F.col("doc_id") % 2 == 0)
    batch = documents.filter(F.col("doc_id") % 2 == 1)
    save_lsh_index(corpus, idx, n=3, num_hashes=16, bands=8)  # uncapped
    cap = 4
    got = _pairs(lsh_index_pairs(spark, batch, idx, n=3, num_hashes=16,
                                 bands=8, max_bucket_size=cap))
    full = _pairs(lsh_pairs(documents, n=3, num_hashes=16, bands=8,
                            max_bucket_size=cap))
    want = {(a, b) for a, b in full if a % 2 == 1 or b % 2 == 1}
    uncapped = _pairs(lsh_index_pairs(spark, batch, idx,
                                      n=3, num_hashes=16, bands=8))
    assert got == want
    assert got < uncapped, "cap never engaged — pick a smaller cap"


def test_probe_cap_guards_buckets_regrown_by_add(spark, tmp_path):
    """An index bucket can regrow past the build-time cap via append-only
    lsh_index_add; the probe's combined-width cap must still drop it."""
    text = "the quick brown fox jumps over the lazy dog number"
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    save_lsh_index(mk([(1, text + " one"), (2, text + " two")]),
                   str(tmp_path / "idx"), max_bucket_size=4)
    # regrow the near-dup bucket well past the cap, append-only
    lsh_index_add(spark, mk([(i, text + f" v{i}") for i in range(3, 9)]),
                  str(tmp_path / "idx"))
    probe = mk([(100, text + " probe")])
    capped = lsh_index_pairs(spark, probe, str(tmp_path / "idx"),
                             max_bucket_size=4)
    uncapped = lsh_index_pairs(spark, probe, str(tmp_path / "idx"))
    assert _pairs(uncapped), "fixture bug: probe found no candidates"
    assert len(_pairs(capped)) < len(_pairs(uncapped))

def test_resync_does_not_double_count_bucket_width(spark, tmp_path):
    """r10 advice: the combined-width audit must count DISTINCT doc ids
    across index+batch. A doc both indexed and re-synced in the batch
    (here: all of them, plus a duplicate append via lsh_index_add) would
    double/triple-count under a naive batch+index sum, pushing the
    apparent width past the cap and dropping a bucket a capped
    from-scratch rerun over corpus+batch keeps."""
    text = "the quick brown fox jumps over the lazy dog number"
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    docs = [(i, text + f" v{i}") for i in range(1, 4)]   # 3 near-dups
    save_lsh_index(mk(docs), idx)
    lsh_index_add(spark, mk(docs), idx)   # re-sync: duplicate index rows
    # batch re-syncs the same 3 docs plus one new near-dup: true distinct
    # bucket width = 4; naive sum = 3(batch) + 6(index rows) = 9 > cap.
    batch = mk(docs + [(4, text + " v4")])
    got = _pairs(lsh_index_pairs(spark, batch, idx, max_bucket_size=5))
    full = _pairs(lsh_pairs(mk(docs + [(4, text + " v4")]), bands=8,
                            max_bucket_size=5))
    assert got == full and len(full) == 6   # C(4,2) — nothing dropped


def test_bucket_cap_rejects_nonpositive(spark, tmp_path):
    import pytest
    from s3_redshift_backup_tool_spark.operators.dedup import (
        lsh_bipartite_pairs, lsh_candidate_pairs)
    mk = lambda rs: spark.createDataFrame(rs, "doc_id long, text string")
    df = mk([(1, "alpha beta gamma delta epsilon zeta")])
    for bad in (0, -1):
        with pytest.raises(ValueError):
            lsh_pairs(df, max_bucket_size=bad)
        with pytest.raises(ValueError):
            save_lsh_index(df, str(tmp_path / "idx"), max_bucket_size=bad)
        with pytest.raises(ValueError):
            lsh_index_pairs(spark, df, str(tmp_path / "idx"),
                            max_bucket_size=bad)
        with pytest.raises(ValueError):
            lsh_bipartite_pairs(df, df, max_bucket_size=bad)
        with pytest.raises(ValueError):
            lsh_candidate_pairs(df, max_bucket_size=bad)
