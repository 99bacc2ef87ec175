"""Unigram-LM tokenizer (operators/unigram.py): the distributed EM
trainer must match the single-node reference (same per-word DP
primitives, only the summation owner differs), likelihood must be
monotone over EM rounds, and the Viterbi encoder must be deterministic
and consistent with hand-checked segmentations."""

from __future__ import annotations

import math

import pytest

from s3_redshift_backup_tool_spark.operators import unigram as ug

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker they come the quicker they go",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "the dog jumps the fox jumps the quick dog",
] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")


def test_trainer_matches_reference(corpus):
    got = ug.train_unigram(corpus, vocab_size=64, n_iters=3)
    ref = ug.reference_unigram(TEXTS, vocab_size=64, n_iters=3)
    assert [p for p, _ in got] == [p for p, _ in ref]
    for (_, a), (_, b) in zip(got, ref):
        assert a == pytest.approx(b, abs=1e-9)


def test_em_likelihood_monotone(corpus):
    from s3_redshift_backup_tool_spark.operators.bpe import word_freq_table
    words = word_freq_table(corpus).localCheckpoint()
    pieces = ug.seed_vocab_df(words, seed_size=128)
    vocab = {p: -math.log(len(pieces)) for p in pieces}
    lls = []
    for _ in range(3):
        counts, ll = ug._em_round(words, vocab, 6)
        lls.append(ll)
        total = sum(counts.values())
        vocab = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        for p in pieces:
            if len(p) == 1 and p not in vocab:
                vocab[p] = math.log(1e-12)
    assert lls[1] >= lls[0] - 1e-9 and lls[2] >= lls[1] - 1e-9


def test_single_chars_never_pruned(corpus):
    vocab = dict(ug.train_unigram(corpus, vocab_size=32, n_iters=2))
    corpus_chars = {c for t in TEXTS for c in t.lower() if c != " "}
    assert corpus_chars <= {p for p in vocab if len(p) == 1}


def test_vocab_size_respected(corpus):
    vocab = ug.train_unigram(corpus, vocab_size=48, n_iters=2)
    n_chars = len([p for p, _ in vocab if len(p) == 1])
    assert len(vocab) <= max(48, n_chars)


def test_viterbi_count_prefers_likely_pieces():
    vocab = {"a": math.log(0.05), "b": math.log(0.05),
             "ab": math.log(0.4), "abab": math.log(0.5)}
    assert ug._viterbi_count("abab", vocab, 6) == 1
    assert ug._viterbi_count("ababab", vocab, 6) == 2   # abab + ab
    assert ug._viterbi_count("ba", vocab, 6) == 2       # chars only


def test_encoder_counts(corpus, spark):
    vocab = ug.train_unigram(corpus, vocab_size=64, n_iters=2)
    out = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in ug.unigram_token_counts(corpus, vocab).collect()}
    vb = dict(vocab)
    for i, t in enumerate(TEXTS):
        ws = [w for w in t.lower().split() if w]
        want = sum(ug._viterbi_count(w, vb, 6) for w in ws)
        assert out[i] == (len(ws), want)
    # tokens never exceed characters, never fewer than words
    for i, t in enumerate(TEXTS):
        nw, nt = out[i]
        assert nw <= nt <= sum(len(w) for w in t.lower().split())


def test_fb_unreachable_word_skipped():
    exp, ll = ug._fb_word("xyz", {"a": -1.0}, 6)
    assert exp == {} and ll == float("-inf")
