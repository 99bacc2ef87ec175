"""Triangle counting / transitivity (operators/graph.py)."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.operators.graph import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    return triangle_stats(df).first()


def test_triangle_hand_cases(spark):
    # K4: 4 triangles, transitivity 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _stats(spark, k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["transitivity"] == 1.0

    # path a-b-c: one wedge, no triangle
    r = _stats(spark, [(1, 2), (2, 3)])
    assert r["n_triangles"] == 0 and r["transitivity"] == 0.0

    # star hub + one closing edge: exactly one triangle regardless of
    # which orientation the hub's edges take
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    r = _stats(spark, star)
    assert r["n_triangles"] == 1


def test_triangle_matches_naive_on_random_graph(spark):
    import itertools
    import random
    rng = random.Random(7)
    nodes = list(range(20))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(60)})
    eset = set(edges)
    naive = sum(1 for a, b, c in itertools.combinations(nodes, 3)
                if (a, b) in eset and (b, c) in eset and (a, c) in eset)
    r = _stats(spark, edges)
    assert r["n_triangles"] == naive


def test_pagerank_star_graph_center_wins(spark):
    from s3_redshift_backup_tool_spark.operators.graph import (
        pagerank, pagerank_canonical)

    # star: 0 at the center of 1..5, plus a detached pair (10, 11)
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)],
        "id_a long, id_b long")
    pr = {r["node"]: r["rank"] for r in pagerank(pairs, iters=3).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-6          # mass conserved
    assert pr[0] == max(pr.values())                   # center most central
    assert all(pr[0] > pr[i] for i in range(1, 6))
    assert abs(pr[10] - pr[11]) < 1e-12                # symmetric pair ties
    canon = {r["component"]: r["canonical_id"]
             for r in pagerank_canonical(pairs, iters=3).collect()}
    assert canon[0] == 0                               # center kept
    assert canon[10] in (10, 11)                       # tie -> lowest id
    assert canon[10] == 10
