"""Connected components over near-dup pair graphs."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.operators.dedup import neardup_components


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_components_long_chain_converges(spark):
    # a 30-node path needs ~15 doubling-free rounds; must still converge
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  ["id_a", "id_b"])
    out = neardup_components(pairs, max_iter=40).collect()
    assert all(r["component"] == 0 for r in out)
    assert len(out) == 31


def test_star_components_known_graph(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components_star)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components_star(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_star_components_long_chain_fast_rounds(spark):
    """The case star rounds exist for: a path graph's diameter (60) far
    exceeds the O(log^2 n) star rounds needed."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components_star)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                  ["id_a", "id_b"])
    out = neardup_components_star(pairs, max_iter=12).collect()
    assert len(out) == 61
    assert all(r["component"] == 0 for r in out)


def test_star_equals_label_prop_on_random_graphs(spark):
    """Equivalence: both algorithms share the path-independent fixed
    point (component min), on graphs with mixed shapes — stars, chains,
    cliques, singleton pairs."""
    import random

    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components, neardup_components_star)

    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(90)}
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        lp = {(r["doc_id"], r["component"])
              for r in neardup_components(pairs, max_iter=40).collect()}
        st = {(r["doc_id"], r["component"])
              for r in neardup_components_star(pairs, max_iter=25).collect()}
        assert st == lp, f"trial {trial}: star != label_prop"


def test_components_algorithm_kwarg_dispatches(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components)
    pairs = spark.createDataFrame([(5, 9), (9, 7)], ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components(pairs, algorithm="star").collect()}
    assert got == {(5, 5), (9, 5), (7, 5)}
