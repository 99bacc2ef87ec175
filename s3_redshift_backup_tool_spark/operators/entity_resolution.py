"""Entity resolution / record linkage: blocking + edit-distance scoring.

The reference moves rows verbatim and has no fuzzy-matching surface; a
training-data pipeline needs one constantly — linking dirty scraped
records (OCR noise, truncation, transcription typos) back to a canonical
dimension. Classic two-stage shape:

1. **Blocking**: candidate pairs only within cheap equality blocks
   (here: exact match on the clean attributes the noise didn't touch).
   This is the scale lever — an all-pairs compare of 10^9 records is
   10^18 pairs; blocking makes it sum-of-block-squares. The block join
   is a plain equi-join, so Catalyst shuffles both sides once on the
   block key; no CartesianProduct ever appears in the plan.
2. **Scoring**: JVM-side Levenshtein (`F.levenshtein`, codegen'd —
   no Python in the hot path) normalized to a [0,1] similarity
   ``1 - lev/max(len)``; threshold, then best-match-per-record via a
   window partitioned by the dirty key (k candidate rows per record,
   never a global sort).

Skew note: a hot block (e.g. a NULL-heavy blocking key) degrades to
block² comparisons; callers with skewed blocks should pre-filter with
``max_block_size`` which drops blocks above a bound and reports them —
the same honest-bound pattern as the LSH stop-bucket guard
(dedup.py). Deterministic tie policy: (similarity desc, candidate key
asc), so reruns and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def block_candidates(dirty: DataFrame, clean: DataFrame,
                     block_cols: list[str],
                     max_block_size: int | None = None) -> DataFrame:
    """Equi-join on blocking keys -> candidate pairs.

    ``dirty`` and ``clean`` must share ``block_cols``. When
    ``max_block_size`` is set, clean-side blocks larger than the bound
    are dropped (bounded worst case; the dropped blocks are the caller's
    signal to pick finer keys)."""
    c = clean
    if max_block_size is not None:
        counts = (clean.groupBy(*block_cols)
                       .agg(F.count(F.lit(1)).alias("__bs"))
                       .where(F.col("__bs") <= max_block_size)
                       .drop("__bs"))
        c = clean.join(F.broadcast(counts), block_cols, "left_semi")
    return dirty.join(c, block_cols)


def lev_similarity(a, b, max_dist: int | None = None):
    """Normalized Levenshtein similarity in [0,1], JVM-side.

    With ``max_dist``, Spark's banded Levenshtein early-exits at
    O(max_dist * n) per pair instead of O(n^2) — the right call when a
    downstream threshold discards distant pairs anyway. Pairs beyond the
    band come back NULL (Spark returns -1 there; -1 would otherwise
    score ABOVE 1.0 through the ``1 - d/len`` formula)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    if max_dist is None:
        d = F.levenshtein(a, b)
    else:
        d = F.levenshtein(a, b, max_dist)
        d = F.when(d >= 0, d)
    return 1.0 - d / F.greatest(F.length(a), F.length(b))


def best_match(pairs: DataFrame, dirty_key: str, clean_key: str,
               sim_col: str = "sim", threshold: float = 0.9) -> DataFrame:
    """Highest-similarity candidate per dirty record above ``threshold``.

    Window partitioned by the dirty key: each partition holds only that
    record's candidates (block-sized, bounded), so this survives any
    corpus size. Ties break to the lowest clean key — deterministic."""
    w = (Window.partitionBy(dirty_key)
               .orderBy(F.desc(sim_col), F.col(clean_key)))
    return (pairs.where(F.col(sim_col) >= threshold)
                 .withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") == 1)
                 .drop("__rn"))


def link_records(dirty: DataFrame, clean: DataFrame,
                 block_cols: list[str],
                 dirty_key: str, clean_key: str,
                 dirty_name: str, clean_name: str,
                 threshold: float = 0.9,
                 max_block_size: int | None = None,
                 round_dp: int = 6,
                 max_name_len: int | None = None) -> DataFrame:
    """End-to-end linkage: block -> score -> best match.

    Output: (dirty_key, clean_key, sim) — one row per dirty record that
    found a match at or above ``threshold``.

    When ``max_name_len`` is given, the Levenshtein call is banded at
    ``floor((1 - threshold) * max_name_len)``: sim >= threshold implies
    distance <= that bound for every pair, so the band provably keeps
    all qualifying pairs while the early-exit skips the O(n^2) DP for
    the (vast) distant majority."""
    cand = block_candidates(dirty, clean, block_cols, max_block_size)
    max_dist = None
    if max_name_len is not None and threshold > 0:
        max_dist = int((1.0 - threshold) * max_name_len)
    scored = cand.select(
        F.col(dirty_key), F.col(clean_key),
        F.round(lev_similarity(dirty_name, clean_name, max_dist),
                round_dp).alias("sim"))
    return best_match(scored, dirty_key, clean_key, "sim", threshold)
