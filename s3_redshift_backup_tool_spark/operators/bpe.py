"""Distributed BPE vocabulary training + encoding (Sennrich'16 shape).

The training-data operators so far COUNT tokens with a fixed regex
(text.token_count_regex); real pipelines also need to LEARN the
tokenizer from the corpus. Classic byte-pair-encoding trains on the
WORD-FREQUENCY table, not the corpus — the critical scale property:
after the first aggregation, every round's work is proportional to the
number of distinct words (millions), not corpus bytes (100 TB). Each
merge round here is one explode + one partial-aggregable groupBy over
that vocab-sized relation plus an O(|word|) per-row array rewrite —
a driver loop of ``n_merges`` rounds exactly like the engine's other
bounded iterative operators (pagerank, NN-Descent), with a
``localCheckpoint`` every few rounds to keep the plan flat.

Exactness contract (tested): the learned merge list is IDENTICAL to a
single-node reference implementation of the textbook algorithm — ties
on pair frequency broken lexicographically so the result is
deterministic and engine-independent.

``apply_bpe`` then encodes documents with the learned ranked merges via
an Arrow-batched pandas iterator (merge table broadcast to workers),
emitting per-document token counts — the number that actually gates
sequence packing and train-budget accounting.

No reference parity (the reference has nothing like this); public
algorithm, public Spark APIs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (textbook BPE: lets merges distinguish suffixes)
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized pass. Lowercased
    whitespace tokenization (the pre-tokenizer is pluggable in spirit;
    this matches the reference implementation in the tests)."""
    return (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                          r"\s+")).alias("word"))
                .where(F.col("word") != "")
                .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def train_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 50,
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ranked
    merge list [(left, right), ...] (rank = list position). Driver-side
    state is ONLY the merge list (n_merges tuples) and one 1-row max per
    round; the word/symbol relation stays distributed."""
    words = word_freq_table(docs, text_col)
    # word -> symbol array: chars + end-of-word marker on the last char
    syms = words.select(
        "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("s"))
    # drop the empty trailing element split("") produces on some rows
    syms = syms.select(
        "freq", F.filter(F.col("s"), lambda x: x != "").alias("s"))

    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        # pair frequencies: one explode + one partial-aggregable groupBy
        # over the vocab-sized relation; deterministic argmax via
        # max(struct(freq, pair)) with the pair INVERTED so frequency
        # ties resolve to the lexicographically SMALLEST pair (matching
        # the reference implementation exactly)
        pairs = syms.select(
            "freq",
            F.explode(F.expr(
                "transform(slice(s, 1, size(s) - 1), "
                "(x, i) -> struct(x as a, s[i + 1] as b))")).alias("p"))
        # deterministic argmax: min_by over (-freq, pair) = highest
        # frequency, ties broken by lexicographically smallest pair
        # (struct ordering is field-by-field) — matches reference_bpe
        agg = (pairs.groupBy("p").agg(F.sum("freq").alias("f"))
                    .agg(F.min_by(F.col("p"),
                                  F.struct((-F.col("f")).alias("nf"),
                                           F.col("p"))).alias("best"),
                         F.max(F.col("f")).alias("bf")))
        row = agg.first()
        if row["best"] is None or row["bf"] is None or row["bf"] < 2:
            break                       # nothing left worth merging
        a, b = row["best"]["a"], row["best"]["b"]
        merges.append((a, b))
        merged = a + b
        # rewrite every word's symbol array: left-to-right single pass,
        # expressed as an aggregate fold (JVM-side, no Python)
        syms = syms.select("freq", _merge_pair_expr("s", a, b, merged))
        if (r + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=False)
    return merges


def _merge_pair_expr(col: str, a: str, b: str, merged: str):
    """aggregate() fold that merges every non-overlapping (a, b)
    occurrence left-to-right, the textbook semantics: acc carries the
    rebuilt array; each step either fuses with the previous element or
    appends."""
    qa, qb, qm = [s.replace("\\", "\\\\").replace("'", "\\'")
                  for s in (a, b, merged)]
    return F.expr(
        f"aggregate({col}, cast(array() as array<string>), "
        f"(acc, x) -> if(size(acc) > 0 "
        f"            and element_at(acc, -1) = '{qa}' and x = '{qb}', "
        f"    concat(slice(acc, 1, size(acc) - 1), array('{qm}')), "
        f"    concat(acc, array(x))))").alias(col)


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Encode each document with the learned merges (ranked; lowest rank
    applies first, per token, textbook order) and emit (id, n_words,
    n_tokens) — Arrow-batched, merge table broadcast via closure."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str, cache: dict) -> int:
        if word in cache:
            return cache[word]
        s = list(word) + [EOW]
        while len(s) > 1:
            best, bi = None, -1
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            s[bi: bi + 2] = [s[bi] + s[bi + 1]]
        cache[word] = len(s)
        return len(s)

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            ids, nw, nt = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().split() if w]
                ids.append(did)
                nw.append(len(words))
                nt.append(sum(_encode_word(w, cache) for w in words))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "n_words": pd.Series(nw, dtype="int64"),
                                "n_tokens": pd.Series(nt, dtype="int64")})

    return docs.select(id_col, text_col).mapInPandas(
        _go, schema=f"{id_col} long, n_words long, n_tokens long")


# -- single-node reference (test oracle; NOT used by the operators) --------

def reference_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Textbook in-memory BPE with the same tie-break (max freq, then
    lexicographically smallest pair). The distributed trainer must
    reproduce this list exactly."""
    from collections import Counter
    wf = Counter(w for t in texts for w in t.lower().split() if w)
    words = {w: list(w) + [EOW] for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, s in words.items():
            f = wf[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        maxf = max(pc.values())
        if maxf < 2:
            break
        # tie-break: lexicographically smallest pair under natural
        # string order (UTF-8 binary order == code-point order, so
        # Spark's struct<string,string> min agrees exactly)
        (a, b) = min(p for p, f in pc.items() if f == maxf)
        merges.append((a, b))
        for w, s in words.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = out
    return merges

