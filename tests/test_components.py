"""Connected components over near-dup pair graphs."""

from __future__ import annotations

from s3_redshift_backup_tool_spark.operators.dedup import neardup_components


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components(pairs, driver_max_edges=0).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_components_long_chain_converges(spark):
    # a 30-node path needs ~15 doubling-free rounds; must still converge
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                  ["id_a", "id_b"])
    out = neardup_components(pairs, max_iter=40, driver_max_edges=0).collect()
    assert all(r["component"] == 0 for r in out)
    assert len(out) == 31


def test_star_components_known_graph(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components_star)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components_star(pairs, driver_max_edges=0).collect()}
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
    out = neardup_components_star(pairs, max_iter=12, driver_max_edges=0).collect()
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
              for r in neardup_components(pairs, max_iter=40, driver_max_edges=0).collect()}
        st = {(r["doc_id"], r["component"])
              for r in neardup_components_star(pairs, max_iter=25, driver_max_edges=0).collect()}
        assert st == lp, f"trial {trial}: star != label_prop"


def test_components_algorithm_kwarg_dispatches(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components)
    pairs = spark.createDataFrame([(5, 9), (9, 7)], ["id_a", "id_b"])
    got = {(r["doc_id"], r["component"])
           for r in neardup_components(pairs, algorithm="star", driver_max_edges=0).collect()}
    assert got == {(5, 5), (9, 5), (7, 5)}


def test_driver_shortcut_equals_distributed(spark):
    """Small graphs short-circuit to driver union-find; the result must
    equal the distributed label propagation exactly (same min-label
    contract, same schema)."""
    import random
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components,
    )
    rng = random.Random(31)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(80)}
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = neardup_components(pairs)            # defaults to the shortcut
    slow = neardup_components(pairs, driver_max_edges=0)
    assert fast.schema == slow.schema
    assert {(r["doc_id"], r["component"]) for r in fast.collect()} == \
        {(r["doc_id"], r["component"]) for r in slow.collect()}


def test_driver_shortcut_also_gates_star(spark):
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components_star,
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)],
                                  "id_a long, id_b long")
    got = {(r["doc_id"], r["component"])
           for r in neardup_components_star(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_driver_shortcut_preserves_id_type(spark):
    """String and int ids must round-trip through the shortcut with the
    input type (a hard-coded long schema would crash on strings and
    silently widen ints depending on graph size)."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components,
    )
    pairs_s = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    out = neardup_components(pairs_s)
    assert dict(out.dtypes) == {"doc_id": "string", "component": "string"}
    got = {(r["doc_id"], r["component"]) for r in out.collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"),
                   ("x", "x"), ("y", "x")}

    pairs_i = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    assert dict(neardup_components(pairs_i).dtypes) == \
        {"doc_id": "int", "component": "int"}


def test_shortcut_threshold_counts_single_direction_edges(spark):
    """Both algorithms gate on the SAME single-direction edge count, so
    one driver_max_edges value means one thing."""
    from s3_redshift_backup_tool_spark.operators.dedup import (
        neardup_components, neardup_components_star,
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long")
    # 10 undirected edges: limit 10 -> shortcut for BOTH (fast, same
    # answer); limit 9 -> distributed for both
    for limit in (10, 9):
        a = {(r["doc_id"], r["component"]) for r in
             neardup_components(pairs, driver_max_edges=limit).collect()}
        b = {(r["doc_id"], r["component"]) for r in
             neardup_components_star(pairs,
                                     driver_max_edges=limit).collect()}
        want = {(i, 0) for i in range(11)}
        assert a == b == want, limit
