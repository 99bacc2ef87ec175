"""Lexical retrieval over the document corpus: TF-IDF / BM25 scoring.

Capability extension beyond the reference (whose users score relevance
in Redshift SQL when they need it at all): rank documents against a
term query with BM25 (Robertson-Spärck Jones), the standard lexical
baseline next to the embedding ANN operators in
``operators/similarity.py``.

Scale design (100 TB corpus, short query):
- The corpus is FILTERED to docs containing at least one query term
  before anything is exploded — ``array_contains`` disjunction in
  WholeStageCodegen at scan speed; non-matching docs (the vast
  majority) never leave the scan stage.
- Only *matching* terms are exploded, so the postings relation is
  O(matched docs x query terms), not O(corpus tokens).
- Document frequencies aggregate to |query| rows and corpus stats to
  one row — both sides broadcast; the only shuffle keyed on data is the
  per-(doc, term) tf groupBy, partial-aggregable map-side.
- Top-k is ``orderBy().limit(k)`` -> TakeOrderedAndProject (per-partition
  heaps + k-row driver merge), never a global sort.

Every hash-free, engine-portable float op (ln, multiply, divide) so the
DuckDB oracle reproduces scores to double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              *, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag-of-terms query.

    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the
    non-negative Lucene variant). Ties break on ``id_col`` so the cut at
    ``k`` is deterministic across engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.col(text_col))
    term_lit = F.array(*[F.lit(t) for t in query_terms])
    # corpus stats over ALL docs (N, avgdl): one 1-row agg, broadcast
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"))
    # scan-stage filter: only docs sharing a term survive to the explode
    # postings materialized once (lazy localCheckpoint): the relation
    # feeds both the per-(doc, term) tf side and the df aggregation, and
    # exchange reuse does not fire across those differently-shaped
    # consumers — unmaterialized, the corpus filter+explode runs twice
    matched = (docs
               .filter(F.arrays_overlap(toks, term_lit))
               .select(F.col(id_col), F.size(toks).alias("dl"),
                       F.explode(F.array_intersect(toks, term_lit))
                        .alias("term"),
                       toks.alias("__t"))
               .select(id_col, "dl", "term",
                       F.size(F.filter(F.col("__t"),
                                       lambda x: x == F.col("term")))
                        .cast("double").alias("tf"))
               .localCheckpoint(eager=False))
    df_t = matched.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))  # one row per matched doc&term
    scored = (matched
              .join(F.broadcast(df_t), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = (F.col("tf")
             + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (scored
            .groupBy(id_col)
            .agg(F.round(F.sum(contrib), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(k))


def rrf_fuse(ranked_lists: list[DataFrame], id_col: str = "doc_id",
             rrf_k: int = 60, topk: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack'09): fuse ranked candidate lists
    by ``sum over lists of 1 / (rrf_k + rank)`` — the standard
    score-scale-free way to combine lexical and semantic retrieval.

    Each input carries (id_col, rank); docs missing from a list simply
    contribute nothing (no imputation). The union is tiny — k rows per
    list — so the fuse is a driver-light few-row aggregation at the end
    of two already-bounded retrieval plans; ties break on id."""
    tagged = ranked_lists[0].select(id_col, "rank")
    for r in ranked_lists[1:]:
        tagged = tagged.unionByName(r.select(id_col, "rank"))
    score = F.round(F.sum(1.0 / (F.lit(rrf_k) + F.col("rank"))), 6)
    return (tagged.groupBy(id_col)
            .agg(score.alias("rrf"))
            .orderBy(F.col("rrf").desc(), F.col(id_col))
            .limit(topk))


def with_rank(df: DataFrame, order_col: str, id_col: str = "doc_id"):
    """1-based rank by (order_col desc, id). The input is an
    already-LIMITed candidate list (k rows), so the single-partition
    global window is k-row work, not a scale hazard."""
    from pyspark.sql import Window
    # The single-partition window is the INTENDED plan (k-row input);
    # WindowExec's "no partition defined" warning fires anyway — Spark
    # folds any constant partition key (EliminateWindowPartitions), so
    # it cannot be silenced without obfuscating the plan. Accepted and
    # documented in PERF.md's warning census.
    w = Window.orderBy(F.col(order_col).desc(), F.col(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def ranking_metrics(ranked: DataFrame, rel_col: str = "rel",
                    rank_col: str = "rank", k: int = 10,
                    n_relevant: int | None = None,
                    round_dp: int = 6) -> DataFrame:
    """Ranking-quality metrics over ONE ranked candidate list:
    NDCG@k, MRR, precision@k. Input is a (bounded, top-N) relation with
    a 1-based ``rank_col`` and binary ``rel_col``.

    NDCG normalizes by the ideal DCG of ``min(n_relevant, k)`` leading
    relevants — pass the corpus-wide relevant count for the standard
    definition (a scalar the caller already has from one count); with
    ``None`` it falls back to the retrieved-set relevants
    (self-normalized variant). All-irrelevant lists score 0, not NULL.
    The aggregate runs over <= N rows — evaluation is bounded work no
    matter the corpus size; it's the RANKING that was the cluster job.
    """
    rel = F.col(rel_col).cast("double")
    rank = F.col(rank_col)
    dcg = F.sum(F.when(rank <= k, rel / F.log2(rank + 1)))
    hits_topk = F.sum(F.when(rank <= k, rel))
    first = F.min(F.when(rel == 1, rank))
    agg = ranked.agg(
        F.coalesce(dcg, F.lit(0.0)).alias("__dcg"),
        F.coalesce(hits_topk, F.lit(0.0)).alias("__hits"),
        first.alias("__first"),
        F.coalesce(F.sum(rel), F.lit(0.0)).alias("__rel_in_list"))
    ideal_n = (F.least(F.lit(n_relevant), F.lit(k)) if n_relevant is not None
               else F.least(F.col("__rel_in_list").cast("int"), F.lit(k)))
    # sequence(1, 0) auto-steps DOWN to [1, 0] in Spark, which would put
    # 1/log2(1) = inf into the fold — gate the whole fold on n >= 1
    idcg = F.when(ideal_n >= 1, F.aggregate(
        F.sequence(F.lit(1), ideal_n),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i + 1))).otherwise(F.lit(0.0))
    return agg.select(
        F.round(F.when(idcg > 0, F.col("__dcg") / idcg)
                 .otherwise(F.lit(0.0)), round_dp).alias(f"ndcg_at_{k}"),
        F.round(F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)),
                round_dp).alias("mrr"),
        F.round(F.col("__hits") / F.lit(float(k)), round_dp)
         .alias(f"precision_at_{k}"))
