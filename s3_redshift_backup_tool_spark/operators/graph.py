"""Graph diagnostics over pair relations (dup graphs, link graphs).

The near-dup pipeline emits an edge list (``lsh_pairs``,
``embedding_neardup_pairs``); its GLOBAL shape is a quality signal:
high transitivity (friends-of-friends are friends) says the candidate
pairs really are equivalence-like and cluster merging
(``neardup_components``) is safe; low transitivity says the threshold
is admitting accidental bridges and components will over-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Triangle count + global transitivity of an undirected edge list
    (edges assumed deduplicated with ``id_a < id_b``).

    Scale shape — the degree-orientation trick (Cohen'09 / Suri-
    Vassilvitskii'11): every edge is oriented from its LOWER-degree
    endpoint to the higher ((degree, id) lexicographic, so orientation
    is total and deterministic). Each triangle then has exactly one
    node with two OUT-edges, and the wedge self-join groups by that
    node — a vertex of degree d contributes at most its out-degree²
    wedges, and max out-degree is O(sqrt(edges)) under this
    orientation, which bounds the worst skew the plain adjacency
    self-join suffers on hub nodes (a degree-1M hub would otherwise
    emit 10^12 wedges; oriented, it emits ~edges).

    Wedges (v, w) from u's out-neighborhood are checked against the
    oriented edge set with one more join. Output: one row
    (n_nodes, n_edges, n_triangles, transitivity) with
    ``transitivity = 3*triangles / open+closed wedges`` (NULL when the
    graph has no wedges)."""
    # materialize the edge list once: it is consumed four times below
    # (degrees, orientation join, wedge join, closure membership) and
    # is tiny next to whatever candidate generator produced it —
    # unmaterialized, the upstream LSH pipeline would replay per use
    # (lazy: eager would execute the whole upstream pair generator at
    # plan-construction time, which plan-inventory/explain never wants)
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")) \
             .localCheckpoint(eager=False)
    nodes = (e.select(F.col("a").alias("n"))
              .unionAll(e.select(F.col("b").alias("n"))))
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    # orient low-(degree, id) -> high-(degree, id)
    tagged = e.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | \
          ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = tagged.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"))
    o1 = oriented.select(F.col("src"), F.col("dst").alias("v"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("w"))
    wedges = (o1.join(o2, "src").filter(F.col("v") < F.col("w"))
                .select("v", "w"))
    tri = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
                .unionAll(oriented.select(F.col("dst").alias("v"),
                                          F.col("src").alias("w"))),
        ["v", "w"], "left_semi")
    # ZERO driver actions (r13 optimization): the triangle count and
    # the degree aggregate are independent subtrees joined by a 1-row
    # cross join, so Spark computes both in a single job when the
    # CALLER's action fires; n_edges = sum(deg)/2 (every edge
    # contributes 2 degree entries) replaces the separate full pass
    # e.count() used to pay, and the transitivity fold is a plain
    # column expression instead of a .first() + createDataFrame round
    # trip through the driver.
    folded = (tri.agg(F.count(F.lit(1)).alias("n_triangles"))
                 .crossJoin(deg.agg(
                     F.count(F.lit(1)).alias("n_nodes"),
                     (F.coalesce(F.sum("d"), F.lit(0)) / 2)
                     .cast("bigint").alias("n_edges"),
                     (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
                     .alias("wedges"))))
    return folded.select(
        "n_nodes", "n_edges", "n_triangles",
        F.when(F.col("wedges") > 0,
               F.round(F.lit(3.0) * F.col("n_triangles")
                       / F.col("wedges"), 6))
         .alias("transitivity"))


def pagerank(pairs: DataFrame, iters: int = 3, damping: float = 0.85,
             id_a: str = "id_a", id_b: str = "id_b",
             pairs_distinct: bool = False) -> DataFrame:
    """PageRank over an undirected pair relation, fixed ``iters`` power
    iterations — the centrality signal web-corpus curation uses for
    URL/host quality (CommonCrawl-style), here runnable directly on the
    dup graph so :func:`pagerank_canonical` can keep each cluster's
    most CENTRAL member instead of its lowest id.

    Scale shape: each iteration is ONE E-row join (contributions flow
    along edges) plus one groupBy(node) — shuffle O(E), the textbook
    distributed PageRank; ranks are localCheckpoint'd per iteration so
    the plan stays flat instead of nesting ``iters`` deep. Fixed
    iteration count (not convergence polling) keeps the job graph
    static and the oracle exactly expressible. Output: (node, rank),
    sum(rank) == 1 within float error.

    Two shuffles-per-iteration the textbook form pays are removed
    (r13 optimization, value-identical):

    - the per-src degree divides every contribution, so ``deg`` is
      joined into the edge list ONCE up front (``ed``) instead of
      re-joined each round;
    - on a SYMMETRIZED edge list every node has >= 1 neighbor, hence
      receives >= 1 contribution, so the dangling-node
      ``nodes LEFT JOIN sums`` is a provable no-op and the new ranks
      come straight off the contribution groupBy.

    ``pairs_distinct=True`` asserts the input pair relation is already
    deduplicated with ``id_a < id_b`` (the lsh_pairs/neardup-pair
    contract); the symmetrized union of such a relation is distinct by
    construction, so the edge-dedup shuffle is skipped."""
    e = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
              .unionByName(pairs.select(F.col(id_b).alias("src"),
                                        F.col(id_a).alias("dst"))))
    if not pairs_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).distinct() \
             .localCheckpoint(eager=False)
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                     .select(F.col("dst").alias("node"),
                             (F.col("rank") / F.col("deg")).alias("c")))
        ranks = (contrib.groupBy("node")
                        .agg((F.lit(base) + F.lit(damping) * F.sum("c"))
                             .alias("rank"))
                        .localCheckpoint(eager=False))
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def pagerank_canonical(pairs: DataFrame, iters: int = 3,
                       damping: float = 0.85, id_a: str = "id_a",
                       id_b: str = "id_b") -> DataFrame:
    """Per dup-cluster canonical selection by CENTRALITY: the kept doc
    is the component member with the highest PageRank (tie -> lowest
    id) — the member most connected to the rest of its cluster, i.e.
    the best exemplar, where min-id keep (dedup_keep_canonical) is
    arbitrary. Output: (component, canonical_id, rank)."""
    from .dedup import neardup_components

    comp = neardup_components(pairs, id_a, id_b)       # (doc_id, component)
    pr = pagerank(pairs, iters, damping, id_a, id_b)
    joined = comp.join(pr, comp[comp.columns[0]] == pr["node"]) \
                 .select("component", F.col("node").alias("canonical_id"),
                         "rank")
    from pyspark.sql import Window
    w = Window.partitionBy("component").orderBy(
        F.desc("rank"), F.col("canonical_id"))
    return (joined.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))


def kcore_peel(pairs: DataFrame, k: int = 2, rounds: int = 3,
               id_a: str = "id_a", id_b: str = "id_b",
               pairs_distinct: bool = False) -> DataFrame:
    """Fixed-round k-core peeling: ``rounds`` iterations of "drop every
    node with degree < k (and its edges)". The dense cores that survive
    are the spam/template clusters worth whole-cluster treatment —
    pairwise dedup sees their edges one at a time; the k-core sees the
    blob. Fixed round count keeps the job graph static and the oracle
    exactly expressible (the pagerank/NN-descent convention); use
    :func:`kcore` for run-to-convergence.

    Each round is one degree groupBy + two semi-joins on the edge list
    — O(E) shuffle per round, edges localCheckpoint'd so the plan stays
    flat. Output: (node, core_deg) for survivors.

    ``pairs_distinct=True`` asserts the pair relation is already
    deduplicated with ``id_a < id_b`` (the lsh_pairs contract), whose
    symmetrized union is distinct by construction — the edge-dedup
    shuffle is skipped (r13 optimization, value-identical)."""
    e = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
              .unionByName(pairs.select(F.col(id_b).alias("src"),
                                        F.col(id_a).alias("dst"))))
    if not pairs_distinct:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        e = (e.join(keep, "src", "left_semi")
              .join(keep.withColumnRenamed("src", "dst"), "dst",
                    "left_semi")
              .localCheckpoint(eager=False))
    return (e.groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("core_deg")))


def kcore(pairs: DataFrame, k: int = 2, max_rounds: int = 50,
          id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Run-to-convergence k-core: peel until the edge count stops
    shrinking (one driver-side scalar count per round — the same
    bounded probe the components loop uses). ``max_rounds`` bounds the
    worst case; real graphs converge in a handful of rounds because
    each round removes whole frontier layers."""
    e = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
              .unionByName(pairs.select(F.col(id_b).alias("src"),
                                        F.col(id_a).alias("dst")))
              .distinct()
              .localCheckpoint(eager=False))
    prev = e.count()
    for _ in range(max_rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        e = (e.join(keep, "src", "left_semi")
              .join(keep.withColumnRenamed("src", "dst"), "dst",
                    "left_semi")
              .localCheckpoint(eager=False))
        cur = e.count()
        if cur == prev:
            break
        prev = cur
    return (e.groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("core_deg")))
