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
    n_tri = tri.count()
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).alias("wedges"))
    n_edges = e.count()
    row = agg.first()
    spark = pairs.sparkSession
    trans = (3.0 * n_tri / float(row["wedges"])) if row["wedges"] else None
    return spark.createDataFrame(
        [(int(row["n_nodes"]), int(n_edges), int(n_tri),
          round(trans, 6) if trans is not None else None)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint, "
        "transitivity double")
