"""Corpus-curation operators: repetition signals, per-group caps,
lang-id confusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators import text as tx


def test_repetition_signals_known_values(spark):
    rows = [
        (1, "a b c d e f g h i j k l"),  # all distinct, no repetition
        (2, "x y x y x y"),              # "x y" 2-gram repeated 3x
        (3, "w w w w"),                  # one word repeated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.repetition_signals(df).collect()}

    assert out[1]["dup_word_frac"] == 0.0
    # doc 2: 6 words, 2 distinct -> 1 - 2/6
    assert abs(out[2]["dup_word_frac"] - (1 - 2 / 6)) < 1e-6
    # doc 2 top 2-gram "x y" occurs 3x, len 3, n_chars 11 -> 9/11
    assert abs(out[2]["top_ngram_char_frac"] - 9 / 11) < 1e-6
    # doc 3: "w w" occurs 3x, len 3, n_chars 7 -> 9/7 > 1 is fine (overlaps)
    assert out[3]["dup_word_frac"] == 0.75
    assert not out[3]["repetition_ok"]
    assert out[1]["repetition_ok"]


def test_stratified_sample_caps_and_is_deterministic(spark, documents):
    docs = documents.select("doc_id", "source")
    k = 5
    s1 = tx.stratified_sample(docs, "source", k)
    s2 = tx.stratified_sample(docs.repartition(7), "source", k)  # layout-proof

    per_group = (s1.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                 .collect())
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in per_group:
        assert r["n"] == min(k, sizes[r["source"]])

    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2          # partitioning-independent selection


def test_decontaminate_overlap_known_values(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        decontaminate_overlap)
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dog")],
        "doc_id long, text string")
    evald = spark.createDataFrame(
        [(10, "the quick brown fox jumps over dog"),   # fully contained
         (11, "completely novel eval text here now"),  # disjoint
         (12, "the quick brown fox ate lunch today")], # partial overlap
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           decontaminate_overlap(evald, train, threshold=0.5).collect()}
    assert out[10]["overlap_frac"] == 1.0 and out[10]["contaminated"]
    assert out[11]["overlap_frac"] == 0.0 and not out[11]["contaminated"]
    # doc 12 shares exactly the shingles "the quick brown"/"quick brown fox"
    assert out[12]["n_overlap"] == 2
    assert 0.0 < out[12]["overlap_frac"] < 1.0


def test_pack_sequences_budget_and_determinism(spark, documents):
    from s3_redshift_backup_tool_spark.operators.sampling import (
        pack_sequences)
    tok = F.size(F.split("text", " "))
    p1 = pack_sequences(documents, "doc_id", tok, budget=256, buckets=8)
    p2 = pack_sequences(documents.repartition(5), "doc_id", tok,
                        budget=256, buckets=8)
    rows = p1.collect()
    assert {(r["doc_id"], r["pack_id"]) for r in rows} == \
        {(r["doc_id"], r["pack_id"]) for r in p2.collect()}  # deterministic

    # every pack's token total stays under budget + its largest member
    # (greedy boundary guarantee)
    from collections import defaultdict
    packs = defaultdict(list)
    for r in rows:
        packs[r["pack_id"]].append(r["n_tokens"])
    for pid, toks in packs.items():
        assert sum(toks) < 256 + max(toks), pid
    # packing is reasonably tight: mean fill of multi-doc packs > half
    fills = [sum(t) for t in packs.values() if len(t) > 1]
    assert fills and sum(fills) / len(fills) > 128


def test_pack_sequences_properties(spark):
    """Property check over generated corpora: every doc packed exactly
    once, pack totals bounded by budget + largest member, bin ids dense
    within each bucket stream."""
    from hypothesis import given, settings, strategies as st
    from s3_redshift_backup_tool_spark.operators.sampling import (
        pack_sequences)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=400),
                    min_size=1, max_size=60),
           st.integers(min_value=32, max_value=512))
    def _check(token_counts, budget):
        rows = [(i, int(t)) for i, t in enumerate(token_counts)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        out = pack_sequences(df, "doc_id", F.col("n"), budget=budget,
                             buckets=4).collect()
        assert len(out) == len(rows)                     # nothing dropped
        assert len({r["doc_id"] for r in out}) == len(rows)
        from collections import defaultdict
        packs = defaultdict(list)
        for r in out:
            packs[r["pack_id"]].append(r["n_tokens"])
        for toks in packs.values():
            assert sum(toks) < budget + max(toks)

    _check()


def test_lang_id_confusion_diagonal_dominates(spark, documents):
    """The heuristic classifier must agree with the label more often than
    any single wrong cell (sanity floor, not an accuracy claim)."""
    conf = (documents.select("lang", tx.lang_id(F.col("text")).alias("p"))
            .groupBy("lang", "p").agg(F.count(F.lit(1)).alias("n")).collect())
    diag = sum(r["n"] for r in conf if r["lang"] == r["p"])
    total = sum(r["n"] for r in conf)
    assert diag > 0 and total > 0


# -- winnowing fingerprints -------------------------------------------------

def test_winnowing_guarantee_shared_span(spark):
    """Any shared run of >= k + window - 1 words yields at least one
    identical fingerprint, regardless of alignment — the property that
    fixed-boundary chunking cannot give."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        winnowing_fingerprints,
    )
    span = " ".join(f"s{i}" for i in range(12))     # 12-word copied span
    a = "alpha beta gamma " + span + " delta"
    b = "one two three four five " + span + " six seven"   # misaligned
    c = " ".join(f"u{i}" for i in range(30))        # unrelated
    docs = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c)], "doc_id string, text string")
    fps = winnowing_fingerprints(docs, k=5, window=4)
    by_doc = {d: {r["fingerprint"] for r in rows} for d, rows in
              ((x, [r for r in fps.collect() if r["doc_id"] == x])
               for x in ("a", "b", "c"))}
    assert by_doc["a"] & by_doc["b"], "shared 12-word span must collide"
    assert not (by_doc["a"] & by_doc["c"])
    assert not (by_doc["b"] & by_doc["c"])


def test_winnowing_short_docs_dropped(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        winnowing_fingerprints,
    )
    docs = spark.createDataFrame(
        [("s", "only seven words here not quite eight"),
         ("t", "this one has exactly eight words in it")],
        "doc_id string, text string")
    out = winnowing_fingerprints(docs, k=5, window=4)
    assert {r["doc_id"] for r in out.collect()} == {"t"}


# -- boilerplate chunk removal ----------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_boilerplate_scrub_removes_shared_chunk_keeps_order(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        remove_boilerplate_chunks,
    )
    boiler = " ".join(f"b{i}" for i in range(4))          # shared chunk
    u1 = " ".join(f"x{i}" for i in range(4))
    u2 = " ".join(f"y{i}" for i in range(4))
    z = "z0 z1 z2 z3"
    docs = _mk_docs(spark, [
        ("a", u1 + " " + boiler + " " + u2 + " tail words"),
        ("b", boiler + " " + z),                           # shares ONLY boiler
        ("c", "totally different words here okay then"),
    ])
    out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in remove_boilerplate_chunks(
               docs, chunk_words=4, max_docs=1).collect()}
    # 'a': chunks [u1, boiler, u2]; boiler removed; remainder 'tail words'
    assert out["a"] == (u1 + " " + u2 + " tail words", 1)
    # 'b': chunks [boiler, z]; boiler removed, z kept
    assert out["b"] == (z, 1)
    # 'c': untouched (chunk 'totally different words here' unique)
    assert out["c"][1] == 0 and out["c"][0].startswith("totally")


def test_boilerplate_scrub_doc_fully_removed_still_present(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        remove_boilerplate_chunks,
    )
    boiler = "p q r s"
    docs = _mk_docs(spark, [
        ("a", boiler), ("b", boiler),        # exactly one chunk each
        ("c", "short doc"),                  # < chunk_words: no chunks
    ])
    out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in remove_boilerplate_chunks(
               docs, chunk_words=4, max_docs=1).collect()}
    assert out["a"] == ("", 1) and out["b"] == ("", 1)
    assert out["c"] == ("short doc", 0)


# -- maximal duplicated spans ------------------------------------------------

def test_duplicated_spans_exact_extents(spark):
    """Planted duplicate: two docs share one long run; the reported span
    must cover exactly the shared run in each doc (k-gram chaining gives
    max-extent recovery), and unique text must produce nothing."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        duplicated_spans,
    )
    import random
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    uniq = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    shared = uniq(120)
    a_prefix, b_prefix = uniq(50), uniq(200)
    docs = spark.createDataFrame(
        [(1, a_prefix + shared + uniq(40)),
         (2, b_prefix + shared + uniq(10)),
         (3, uniq(300))],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
           for r in duplicated_spans(docs, k=20, min_len=40).collect()}
    assert set(out) == {1, 2}
    # doc 1: shared run starts at 51 (1-based), length 120
    assert out[1] == (51, 170, 120)
    assert out[2] == (201, 320, 120)


def test_duplicated_spans_merges_chained_grams_once(spark):
    """Two separate shared runs in one doc produce two islands, not one
    merged span, when the gap between them exceeds k."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        duplicated_spans,
    )
    import random
    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    uniq = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    s1, s2 = uniq(80), uniq(90)
    gap = uniq(100)
    docs = spark.createDataFrame(
        [(1, s1 + gap + s2),
         (2, uniq(30) + s1 + uniq(60) + s2 + uniq(5))],
        "doc_id long, text string")
    rows = duplicated_spans(docs, k=20, min_len=40) \
        .filter("doc_id = 1").orderBy("span_start").collect()
    assert [(r["span_start"], r["span_end"]) for r in rows] == \
        [(1, 80), (181, 270)]


def test_duplicated_spans_max_doc_freq_caps_hubs(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        duplicated_spans,
    )
    boiler = "x" * 100   # shared by ALL docs (hub)
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(6)], "doc_id long, text string")
    assert duplicated_spans(docs, k=20, min_len=40).count() == 6
    capped = duplicated_spans(docs, k=20, min_len=40, max_doc_freq=3)
    assert capped.count() == 0


def test_scrub_duplicated_spans_keeps_one_canonical_copy(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        scrub_duplicated_spans,
    )
    import random
    rng = random.Random(23)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    uniq = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    shared = uniq(100)
    a, b, c = uniq(40), uniq(70), uniq(90)
    docs = spark.createDataFrame(
        [(1, a + shared),            # canonical (min id) — untouched
         (2, b + shared + c),       # span cut, prefix+suffix survive
         (3, uniq(150))],            # no dup — untouched
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in scrub_duplicated_spans(docs, k=20, min_len=40)
           .collect()}
    assert out[1] == a + shared
    assert out[3] is not None and len(out[3]) == 150
    assert shared not in out[2]
    assert out[2] == b + c


def test_scrub_duplicated_spans_multiple_cuts_in_one_doc(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        scrub_duplicated_spans,
    )
    import random
    rng = random.Random(5)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    uniq = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    s1, s2 = uniq(80), uniq(80)
    mid, tail = uniq(120), uniq(30)
    docs = spark.createDataFrame(
        [(1, s1), (2, s2),
         (3, s1 + mid + s2 + tail)],   # loses both shared runs
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in scrub_duplicated_spans(docs, k=20, min_len=40)
           .collect()}
    assert out[1] == s1 and out[2] == s2
    assert out[3] == mid + tail


def test_source_overlap_matrix_semantics(spark):
    """Contamination matrix sanity: a source sharing most text with
    another estimates high Jaccard; a disjoint-vocabulary source
    estimates ~0; output is one row per unordered source pair."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        source_overlap_matrix)

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = ([(i, "a", shared + f" tail{i}") for i in range(5)]
            + [(10 + i, "b", shared + f" other{i}") for i in range(5)]
            + [(20 + i, "c", "uno dos tres cuatro cinco seis siete "
                f"ocho nueve diez x{i}") for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["source_a"], r["source_b"]): r["est_jaccard"]
           for r in source_overlap_matrix(df).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # true shingle Jaccard here is ~0.29 (8 shared interior 3-grams; the
    # per-doc tails dilute the union) — the estimate must land near it
    assert 0.1 < got[("a", "b")] < 0.6
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0
