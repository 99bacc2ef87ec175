"""DataFrame-native BPE vocabulary training (Sennrich et al. 2016).

The part of tokenizer-building that actually touches 100 TB is ONE
corpus pass: the word-frequency dictionary. Everything after operates
on the DISTINCT-WORD relation (vocabulary-sized, millions of rows, not
trillions), so the merge loop is k small distributed jobs:

- per iteration: adjacent-symbol pair counts weighted by word frequency
  (one partial-aggregable groupBy over the dictionary), a 1-row argmax
  collect, then a per-row array fold applying the winning merge
  greedily left-to-right — no shuffle for the rewrite;
- the dictionary is localCheckpoint'd per iteration so the lineage
  doesn't grow by one fold per merge (the iterative-algorithm device
  used by neardup components and k-means here).

Training on a hash-gate sample (``sampling.sample_by_hash``) is the
100 TB mode — merge ranks need the distribution, not every word, the
same swap note as the IVF quantizer.

SEGMENTATION (applying thousands of merges to every document) is the
opposite cost shape: per-row Python with a real tokenizer library is
the production path; :func:`segment_words` ships an Arrow-batched
mapInPandas reference implementation so the pipeline shape (schema,
batching, broadcast merges) is real even where the kernel would be
swapped for a native tokenizer.

No DuckDB oracle: the argmax-rewrite loop is iterative (not
SQL-expressible); correctness is pinned against an independent
pure-Python reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (Sennrich's </w>): lets BPE distinguish "low" the
#: word from "low" the prefix of "lower".
EOW = "▁"


def word_dictionary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: (word, n) frequency dictionary."""
    return (df.select(F.explode(F.split(F.col(text_col), "\\s+"))
                       .alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _merge_pair_expr(a: str, b: str):
    """Greedy left-to-right application of merge (a, b) to a symbol
    array, as a pure fold expression (no Python, no shuffle)."""
    def step(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x)))
    return F.aggregate(F.col("syms"),
                       F.array().cast("array<string>"), step)


def train_bpe_merges(df: DataFrame, text_col: str = "text",
                     num_merges: int = 50,
                     min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Deterministic
    tie-break: (count desc, left asc, right asc) — pinned so retrains
    and the test reference agree bit-for-bit. Stops early when no pair
    reaches ``min_pair_count``."""
    words = (word_dictionary(df, text_col)
             .select(F.concat(
                         F.filter(F.split("word", ""),
                                  lambda x: x != ""),
                         F.array(F.lit(EOW))).alias("syms"),
                     "n")
             .localCheckpoint(eager=False))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # fully-merged words (1 symbol) carry no pairs — and MUST be
        # filtered before the index transform: F.sequence(1, 0) steps
        # DOWNWARD, producing out-of-bounds element_at probes
        pairs = (words.filter(F.size("syms") > 1).select(
                    F.explode(F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"))))
                     .alias("p"), "n")
                 .groupBy("p.a", "p.b")
                 .agg(F.sum("n").alias("c"))
                 .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                 .limit(1)
                 .collect())
        if not pairs or pairs[0]["c"] < min_pair_count:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        words = (words.select(_merge_pair_expr(a, b).alias("syms"), "n")
                      .localCheckpoint(eager=False))
    return merges


def segment_words(df: DataFrame, merges: list[tuple[str, str]],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Apply learned merges to every document: Arrow-batched
    mapInPandas (real tokenizers are native libs — this is the
    reference kernel behind the same plumbing). Output:
    (id, n_words, n_tokens, tokens_per_word) — the fertility stats a
    tokenizer evaluation wants; emitting every token row would just be
    an explode on top."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = (f"{id_col} long, n_words long, n_tokens long, "
                  "tokens_per_word double")

    def _seg(batches):
        import pandas as pd

        def encode_word(w: str) -> int:
            syms = list(w) + [EOW]
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
            return len(syms)

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split() if w]
                n_tok = sum(encode_word(w) for w in words)
                nw = len(words)
                rows.append((did, nw, n_tok,
                             (n_tok / nw) if nw else 0.0))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_words", "n_tokens", "tokens_per_word"])

    from .partitioning import fan_out
    return (fan_out(df.select(id_col, text_col))
            .mapInPandas(_seg, schema=out_schema))
