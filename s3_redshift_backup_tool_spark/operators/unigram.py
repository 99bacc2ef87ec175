"""Distributed Unigram-LM tokenizer training (Kudo'18 shape) + encoding.

Companion to the BPE trainer (operators/bpe.py): real pipelines choose
between merge-based (BPE) and likelihood-based (SentencePiece unigram)
tokenizers; this adds the latter with the same critical scale property —
after ONE corpus-sized aggregation into the word-frequency table, every
EM round's work is proportional to the number of DISTINCT words
(millions), not corpus bytes (100 TB).

Shape per EM round:
  E-step  — an Arrow-batched kernel runs forward-backward over each
            distinct word's segmentation lattice (pure per-row DP,
            O(|word| x max_piece_len)), weighted by word frequency, and
            emits per-batch (piece, expected_count) partials; one
            partial-aggregable groupBy reduces them to the vocab-sized
            counts relation.
  M-step  — the vocab-sized counts (thousands of rows) come to the
            driver (the k x dim allowed class), are renormalized to
            log-probs, and pruned to the target size (single characters
            are never pruned, so every word stays reachable).

The driver loop is bounded (n_iters rounds) like the engine's other
iterative operators (pagerank, NN-Descent, BPE merges).

Exactness contract (tested in tests/test_unigram.py): the distributed
trainer produces the same vocabulary and log-probs (to float tolerance)
as :func:`reference_unigram`, a single-node implementation sharing the
same per-word DP primitives — the only difference is WHO sums the
expected counts (Spark's partial aggregation vs a Python loop).

``unigram_token_counts`` then encodes documents with the learned vocab
via Viterbi best-segmentation (Arrow-batched, per-partition word cache,
vocab broadcast in the closure) — per-document token counts for
sequence packing and train-budget accounting, the same deliverable as
``apply_bpe``.

No reference parity (the backup tool has nothing like this); public
algorithm, public Spark APIs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_freq_table

_NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# per-word DP primitives — shared by the distributed kernel AND the
# single-node reference, so the two can only differ in summation order.
# ---------------------------------------------------------------------------

def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _fb_word(word: str, vocab: dict[str, float], max_len: int
             ) -> tuple[dict[str, float], float]:
    """Forward-backward over one word's lattice: returns
    ({piece: posterior expected count in this word}, log-likelihood)."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = vocab.get(word[i:j])
            if lp is not None and alpha[i] != _NEG_INF:
                alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    loglik = alpha[n]
    if loglik == _NEG_INF:          # unreachable (char outside vocab)
        return {}, _NEG_INF
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = vocab.get(word[i:j])
            if lp is not None and beta[j] != _NEG_INF:
                beta[i] = _logsumexp2(beta[i], lp + beta[j])
    exp: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = word[i:j]
            lp = vocab.get(p)
            if (lp is not None and alpha[i] != _NEG_INF
                    and beta[j] != _NEG_INF):
                exp[p] = exp.get(p, 0.0) + math.exp(
                    alpha[i] + lp + beta[j] - loglik)
    return exp, loglik


def _viterbi_count(word: str, vocab: dict[str, float], max_len: int) -> int:
    """Number of pieces in the max-likelihood segmentation (ties broken
    toward the LONGER final piece, i.e. the smaller split point, so the
    result is deterministic)."""
    n = len(word)
    best = [(_NEG_INF, 0)] * (n + 1)
    best[0] = (0.0, 0)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = vocab.get(word[i:j])
            if lp is not None and best[i][0] != _NEG_INF:
                cand = (best[i][0] + lp, best[i][1] + 1)
                if cand[0] > best[j][0] or (cand[0] == best[j][0]
                                            and cand[1] < best[j][1]):
                    best[j] = cand
    return best[n][1] if best[n][0] != _NEG_INF else len(word)


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

def seed_vocab_df(words: DataFrame, max_piece_len: int = 6,
                  min_freq: int = 2, seed_size: int = 512) -> list[str]:
    """Candidate pieces from the word-frequency table: every substring
    up to ``max_piece_len`` scored by total occurrence frequency — one
    Arrow pass over the vocab-sized relation + one groupBy. All single
    characters are kept unconditionally; multi-char candidates below
    ``min_freq`` are dropped and the rest capped to ``seed_size`` by
    (freq desc, piece asc) for determinism."""
    mx = max_piece_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                for i in range(n):
                    for j in range(i + 1, min(n, i + mx) + 1):
                        p = word[i:j]
                        counts[p] = counts.get(p, 0) + int(freq)
            if counts:
                yield pd.DataFrame({"piece": list(counts),
                                    "c": list(counts.values())})

    agg = (words.mapInPandas(gen, schema="piece string, c long")
           .groupBy("piece").agg(F.sum("c").alias("c")))
    rows = agg.collect()                    # vocab-sized driver transfer
    chars = sorted({r["piece"] for r in rows if len(r["piece"]) == 1})
    multi = sorted(
        ((r["piece"], r["c"]) for r in rows
         if len(r["piece"]) > 1 and r["c"] >= min_freq),
        key=lambda t: (-t[1], t[0]))
    budget = max(seed_size - len(chars), 0)
    return chars + [p for p, _ in multi[:budget]]


def _em_round(words: DataFrame, vocab: dict[str, float], max_len: int
              ) -> tuple[dict[str, float], float]:
    """One distributed E-step: expected piece counts + total loglik.
    The kernel emits per-batch partials; the groupBy reduce and the
    vocab-sized collect mirror the covariance moments pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, float] = {}
            ll = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                exp, wll = _fb_word(word, vocab, max_len)
                if wll == _NEG_INF:
                    continue
                f = float(freq)
                ll += f * wll
                for p, c in exp.items():
                    counts[p] = counts.get(p, 0.0) + f * c
            counts["\x00loglik"] = ll      # sentinel row, reduced too
            yield pd.DataFrame({"piece": list(counts),
                                "c": list(counts.values())})

    rows = (words.mapInPandas(gen, schema="piece string, c double")
            .groupBy("piece").agg(F.sum("c").alias("c"))
            .collect())
    counts = {r["piece"]: r["c"] for r in rows}
    loglik = counts.pop("\x00loglik", _NEG_INF)
    return counts, loglik


def train_unigram(docs: DataFrame, text_col: str = "text",
                  vocab_size: int = 256, n_iters: int = 4,
                  max_piece_len: int = 6, min_freq: int = 2,
                  seed_size: int = 512) -> list[tuple[str, float]]:
    """Learn a unigram-LM vocabulary: seed -> ``n_iters`` EM rounds ->
    prune to ``vocab_size`` by expected count (single chars never
    pruned; ties by piece for determinism). Returns sorted
    [(piece, logprob)]. Driver-side state is only the vocab-sized
    piece table; the word relation stays distributed."""
    words = word_freq_table(docs, text_col).localCheckpoint()
    pieces = seed_vocab_df(words, max_piece_len, min_freq, seed_size)
    lp0 = -math.log(len(pieces))
    vocab = {p: lp0 for p in pieces}
    for it in range(n_iters):
        counts, _ = _em_round(words, vocab, max_piece_len)
        total = sum(counts.values())
        if total <= 0:
            break
        vocab = {p: math.log(c / total) for p, c in counts.items()
                 if c > 0.0}
        # keep every single char reachable even if its count hit zero
        for p in pieces:
            if len(p) == 1 and p not in vocab:
                vocab[p] = math.log(1e-12)
        if it == n_iters - 1:
            chars = {p for p in vocab if len(p) == 1}
            multi = sorted(((p, counts.get(p, 0.0)) for p in vocab
                            if len(p) > 1),
                           key=lambda t: (-t[1], t[0]))
            budget = max(vocab_size - len(chars), 0)
            keep = chars | {p for p, _ in multi[:budget]}
            kept = {p: counts.get(p, 1e-12) for p in keep}
            total = sum(kept.values())
            vocab = {p: math.log(max(c, 1e-12) / total)
                     for p, c in kept.items()}
    return sorted(vocab.items())


def reference_unigram(texts: list[str], vocab_size: int = 256,
                      n_iters: int = 4, max_piece_len: int = 6,
                      min_freq: int = 2, seed_size: int = 512
                      ) -> list[tuple[str, float]]:
    """Single-node reference: same seed, same EM, same prune — the sums
    run in a Python loop instead of Spark's partial aggregation. Used
    by the tests to pin the distributed trainer's exactness."""
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] = wf.get(w, 0) + 1
    counts0: dict[str, int] = {}
    for w, f in wf.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                counts0[w[i:j]] = counts0.get(w[i:j], 0) + f
    chars = sorted({p for p in counts0 if len(p) == 1})
    multi = sorted(((p, c) for p, c in counts0.items()
                    if len(p) > 1 and c >= min_freq),
                   key=lambda t: (-t[1], t[0]))
    pieces = chars + [p for p, _ in multi[:max(seed_size - len(chars), 0)]]
    lp0 = -math.log(len(pieces))
    vocab = {p: lp0 for p in pieces}
    for it in range(n_iters):
        counts: dict[str, float] = {}
        for w, f in wf.items():
            exp, wll = _fb_word(w, vocab, max_piece_len)
            if wll == _NEG_INF:
                continue
            for p, c in exp.items():
                counts[p] = counts.get(p, 0.0) + f * c
        total = sum(counts.values())
        if total <= 0:
            break
        vocab = {p: math.log(c / total) for p, c in counts.items()
                 if c > 0.0}
        for p in pieces:
            if len(p) == 1 and p not in vocab:
                vocab[p] = math.log(1e-12)
        if it == n_iters - 1:
            chs = {p for p in vocab if len(p) == 1}
            mlt = sorted(((p, counts.get(p, 0.0)) for p in vocab
                          if len(p) > 1),
                         key=lambda t: (-t[1], t[0]))
            budget = max(vocab_size - len(chs), 0)
            keep = chs | {p for p, _ in mlt[:budget]}
            kept = {p: counts.get(p, 1e-12) for p in keep}
            total = sum(kept.values())
            vocab = {p: math.log(max(c, 1e-12) / total)
                     for p, c in kept.items()}
    return sorted(vocab.items())


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def unigram_token_counts(docs: DataFrame, vocab: list[tuple[str, float]],
                         text_col: str = "text", id_col: str = "doc_id",
                         max_piece_len: int = 6) -> DataFrame:
    """Per-document Viterbi token counts under a learned unigram vocab
    (broadcast in the closure; per-partition word cache like
    ``apply_bpe``): (id_col, n_words, n_tokens). Linear in corpus
    bytes, zero shuffles."""
    vb = dict(vocab)
    mx = max_piece_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def count_word(w: str) -> int:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _viterbi_count(w, vb, mx)
            return got

        for pdf in batches:
            nw, nt = [], []
            for text in pdf[text_col]:
                ws = [w for w in (text or "").lower().split() if w]
                nw.append(len(ws))
                nt.append(sum(count_word(w) for w in ws))
            out = pd.DataFrame({id_col: pdf[id_col],
                                "n_words": pd.array(nw, dtype="int64"),
                                "n_tokens": pd.array(nt, dtype="int64")})
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, n_words long, n_tokens long")
