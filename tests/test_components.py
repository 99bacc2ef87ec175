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
