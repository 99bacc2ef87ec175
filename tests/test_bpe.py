"""Distributed BPE training (operators/bpe.py): the learned merge list
must be IDENTICAL to the single-node textbook reference, and apply_bpe's
token counts must match encoding with the reference merges."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.operators.bpe import (
    EOW, apply_bpe, reference_bpe, train_bpe, word_freq_table)

CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "low lower lowest low low",
    "new newer newest new news",
    "the the the a a an",
    "wider wide widest widely",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_word_freq_table(spark):
    wf = {r["word"]: r["freq"]
          for r in word_freq_table(_docs(spark)).collect()}
    assert wf["the"] == 7 and wf["low"] == 3 and wf["a"] == 2


def test_train_matches_reference_exactly(spark):
    got = train_bpe(_docs(spark), n_merges=20)
    want = reference_bpe(CORPUS, 20)
    assert got == want, f"\n spark: {got}\n ref:   {want}"
    assert len(got) > 5                       # corpus supports merges


def test_train_stops_when_no_pair_repeats(spark):
    # every word unique, single char -> best pair freq < 2 immediately
    docs = _docs(spark, ["a b c d e"])
    assert train_bpe(docs, n_merges=10) == reference_bpe(["a b c d e"], 10)


def test_apply_bpe_counts_match_reference_encoding(spark):
    merges = reference_bpe(CORPUS, 15)
    out = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in apply_bpe(_docs(spark), merges).collect()}
    # reference encode
    ranks = {p: i for i, p in enumerate(merges)}

    def enc(word):
        s = list(word) + [EOW]
        while len(s) > 1:
            cands = [(ranks[(s[i], s[i + 1])], i)
                     for i in range(len(s) - 1)
                     if (s[i], s[i + 1]) in ranks]
            if not cands:
                break
            _, i = min(cands)
            s[i: i + 2] = [s[i] + s[i + 1]]
        return len(s)

    for i, t in enumerate(CORPUS):
        words = t.lower().split()
        assert out[i] == (len(words), sum(enc(w) for w in words)), t


def test_more_merges_never_increase_token_count(spark):
    docs = _docs(spark)
    m5 = reference_bpe(CORPUS, 5)
    m20 = reference_bpe(CORPUS, 20)
    t5 = {r["doc_id"]: r["n_tokens"] for r in apply_bpe(docs, m5).collect()}
    t20 = {r["doc_id"]: r["n_tokens"]
           for r in apply_bpe(docs, m20).collect()}
    assert all(t20[k] <= t5[k] for k in t5)
