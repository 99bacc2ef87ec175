"""BPE vocabulary training vs an independent pure-Python reference
(Sennrich'16 dictionary algorithm, same deterministic tie-break)."""

from __future__ import annotations

from collections import Counter

from s3_redshift_backup_tool_spark.operators.bpe import (
    EOW, segment_words, train_bpe_merges, word_dictionary,
)


def _naive_bpe(texts: list[str], num_merges: int,
               min_pair_count: int = 2) -> list[tuple[str, str]]:
    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    dico = {tuple(list(w) + [EOW]): n for w, n in words.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in dico.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # tie-break pinned: count desc, left asc, right asc
        (a, b), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_pair_count:
            break
        merges.append((a, b))
        new = {}
        for syms, n in dico.items():
            out = []
            for x in syms:                      # greedy left-to-right
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + n
        dico = new
    return merges


TEXTS = [
    "low lower lowest low low",
    "newer newest new new newer",
    "wider wide wide widest",
    "low newer wide lowest",
]


def test_bpe_merges_match_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = train_bpe_merges(df, num_merges=12)
    want = _naive_bpe(TEXTS, num_merges=12)
    assert got == want
    assert len(got) >= 8                        # actually learned merges


def test_word_dictionary_counts(spark):
    df = spark.createDataFrame([(0, "a b a  a")], "doc_id long, text string")
    d = {r["word"]: r["n"] for r in word_dictionary(df).collect()}
    assert d == {"a": 3, "b": 1}


def test_segment_words_fertility(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    merges = train_bpe_merges(df, num_merges=12)
    out = {r["doc_id"]: r for r in
           segment_words(df, merges).collect()}
    assert len(out) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        nw = len(t.split())
        assert out[i]["n_words"] == nw
        # every word tokenizes to >= 1 and <= len(word)+1 symbols
        assert nw <= out[i]["n_tokens"] <= sum(len(w) + 1
                                               for w in t.split())
    # with enough merges, frequent words compress below char level
    assert out[0]["tokens_per_word"] < 4.0


def test_segment_with_no_merges_is_char_level(spark):
    df = spark.createDataFrame([(0, "ab c")], "doc_id long, text string")
    r = segment_words(df, []).first()
    # "ab"->a,b,EOW (3) + "c"->c,EOW (2)
    assert r["n_tokens"] == 5 and r["n_words"] == 2


def test_token_count_bpe_matches_segment_words(spark):
    """text.token_count_bpe applies TRAINED merges — its counts must be
    exactly segment_words' n_tokens (the regex counter is a different,
    honestly-named function now)."""
    from s3_redshift_backup_tool_spark.operators.text import (
        token_count_bpe, token_count_regex)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest new")],
        "doc_id long, text string")
    merges = train_bpe_merges(df, num_merges=10)
    got = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe(df, merges).collect()}
    want = {r["doc_id"]: r["n_tokens"]
            for r in segment_words(df, merges).collect()}
    assert got == want and len(got) == 2
    # and the regex counter is a genuinely different number here
    rx = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", token_count_regex(F.col("text")).alias("n")).collect()}
    assert rx[1] == 3  # whole words, no subword splits
