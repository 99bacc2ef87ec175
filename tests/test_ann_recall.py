"""ANN quality: recall@10 of the approximate paths vs brute force.

Round-1 verdict: "the ANN quality claim is measured, not asserted".
Recall floors are stated per method; multi-probe must beat single-probe
(that is its entire purpose), and IVF with nprobe=2 must beat a single
inverted list's expected coverage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_redshift_backup_tool_spark.operators import similarity as sim

K = 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.cache()
    emb.count()
    return emb


@pytest.fixture(scope="module")
def query_vecs(vectors):
    rows = (vectors.filter(F.col("vec_id") < N_QUERIES)
            .orderBy("vec_id").collect())
    return {int(r["vec_id"]): [float(v) for v in r["embedding"]] for r in rows}


def _ids(df) -> set[int]:
    return {int(r["vec_id"]) for r in df.collect()}


def _mean_recall(vectors, query_vecs, approx_fn) -> float:
    total = 0.0
    for qid, qv in query_vecs.items():
        truth = _ids(sim.cosine_topk(vectors, qv, k=K))
        got = _ids(approx_fn(qv))
        total += len(truth & got) / K
    return total / len(query_vecs)


def test_lsh_recall_floors(vectors, query_vecs):
    """Measured on the synthetic fixture (near-isotropic vectors, the
    WORST case for SRP — recall tracks scan fraction when there is no
    cluster structure): single-probe 0.21 vs 1/16=0.06 scan fraction,
    multi-probe 0.53 vs 5/16=0.31. Floors sit below measurement with
    margin; both beat their scan fraction, i.e. the hash carries signal
    even without structure."""
    single = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_lsh(vectors, qv, k=K, n_planes=4,
                                    probe_bits=0))
    multi = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_lsh(vectors, qv, k=K, n_planes=4,
                                    probe_bits=1))
    assert single >= 0.10, f"single-probe recall@10 {single:.2f}"
    assert single >= 1.5 / 16, "must beat the random-scan-fraction baseline"
    assert multi >= 0.40, f"multi-probe recall@10 {multi:.2f}"
    assert multi >= single, "multi-probe must not lose recall"


def test_ivf_recall_floor(vectors, query_vecs):
    """Measured 0.94 with nprobe=2 of 8 lists (scan fraction 1/4): the
    coarse quantizer keeps near neighbors in probed lists far above the
    scan fraction."""
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    ivf = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_ivf(vectors, qv, cents, k=K, nprobe=2))
    assert ivf >= 0.7, f"IVF nprobe=2 recall@10 {ivf:.2f}"


def test_kmeans_quantizer_improves_inertia_and_recall(vectors, query_vecs):
    """Lloyd's iterations from the first-n init must not worsen the
    k-means objective (guaranteed by the algorithm), and the resulting
    IVF search must not lose recall vs the stub quantizer."""
    stub = sim.ivf_centroids(vectors, n_centroids=8)
    km = sim.kmeans_centroids(vectors, n_centroids=8, iters=4)
    i_stub = sim.ivf_inertia(vectors, stub)
    i_km = sim.ivf_inertia(vectors, km)
    assert i_km <= i_stub * (1 + 1e-9), (i_km, i_stub)

    r_stub = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_ivf(vectors, qv, stub, k=K, nprobe=2))
    r_km = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_ivf(vectors, qv, km, k=K, nprobe=2))
    assert r_km >= r_stub - 0.1, (r_km, r_stub)


def test_recall_report(vectors, query_vecs, capsys):
    """Record the measured numbers (picked up by the perf notes)."""
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    rows = {
        "lsh_1probe": _mean_recall(
            vectors, query_vecs, lambda qv: sim.ann_topk_lsh(
                vectors, qv, k=K, n_planes=4, probe_bits=0)),
        "lsh_multiprobe": _mean_recall(
            vectors, query_vecs, lambda qv: sim.ann_topk_lsh(
                vectors, qv, k=K, n_planes=4, probe_bits=1)),
        "ivf_nprobe2": _mean_recall(
            vectors, query_vecs, lambda qv: sim.ann_topk_ivf(
                vectors, qv, cents, k=K, nprobe=2)),
    }
    with capsys.disabled():
        print("\nANN recall@10 over", len(query_vecs), "queries:",
              {k: round(v, 3) for k, v in rows.items()})
    assert all(0.0 <= v <= 1.0 for v in rows.values())


def test_ivf_index_persists_and_reproduces_results(spark, embeddings, tmp_path):
    from s3_redshift_backup_tool_spark.operators.similarity import (
        ann_topk_ivf, kmeans_centroids, load_ivf_index, save_ivf_index)

    cents = kmeans_centroids(embeddings, n_centroids=8, iters=3)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(spark, cents, path)
    loaded = load_ivf_index(spark, path)
    assert [i for i, _ in loaded] == [i for i, _ in sorted(cents)]

    q = [float(v) for v in embeddings.first()["embedding"]]
    a = ann_topk_ivf(embeddings, q, centroids=cents, nprobe=2).collect()
    b = ann_topk_ivf(embeddings, q, centroids=loaded, nprobe=2).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in a] == \
           [(r["vec_id"], r["cos_sim"]) for r in b]


def test_semantic_dedup_keeps_one_per_tight_neighborhood(spark):
    """SemDeDup end-to-end: near-identical vectors in one cluster
    collapse to the min id; distinct vectors all survive."""
    from s3_redshift_backup_tool_spark.operators.similarity import (
        ivf_centroids, semantic_dedup, semantic_dedup_pairs)

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.9, 0.1, 0.0, 0.0]),     # near-dup of 11/12 (and near 0)
        (11, [0.91, 0.09, 0.0, 0.0]),
        (12, [0.89, 0.11, 0.0, 0.0]),
        (20, [0.0, 0.0, 1.0, 0.0]),     # lone vector, own direction
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(emb, n_centroids=2)

    pairs = semantic_dedup_pairs(emb, cents, threshold=0.999)
    pair_ids = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (10, 11) in pair_ids and (10, 12) in pair_ids
    assert all(a >= 10 and b >= 10 for a, b in pair_ids)  # 0/1 not near-dups

    kept = sorted(r["vec_id"] for r in
                  semantic_dedup(emb, cents, threshold=0.999).collect())
    assert kept == [0, 1, 10, 20]       # 11, 12 collapse into 10


def test_semantic_pairs_never_cross_clusters(spark):
    """The cluster key must bound comparisons: two identical vectors
    assigned to different clusters (forced by centroid choice) yield no
    pair — the documented recall/cost trade of cluster-bounded dedup."""
    from s3_redshift_backup_tool_spark.operators.similarity import (
        semantic_dedup_pairs)

    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.01]),
            (5, [1.0, 0.0]), (6, [-1.0, 0.01])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 0.01])]
    got = {(r["id_a"], r["id_b"])
           for r in semantic_dedup_pairs(emb, cents, threshold=0.5).collect()}
    assert got == {(0, 5), (1, 6)}


def test_hamming2_and_multitable_recall_ladder(vectors, query_vecs):
    """The recall amplifiers must form a ladder on the isotropic
    fixture (n_planes=8, the production-ish code width): Hamming-2
    probing beats Hamming-1, and 4 independent tables beat one —
    recall ~ 1-(1-p)^L. Floors measured with margin (h2 ~0.34,
    mt4h2 ~0.81 at sf0.01)."""
    h1 = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_lsh(vectors, qv, k=K, probe_bits=1))
    h2 = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_lsh(vectors, qv, k=K, probe_bits=2))
    mt = _mean_recall(
        vectors, query_vecs,
        lambda qv: sim.ann_topk_lsh_multitable(vectors, qv, k=K,
                                               n_tables=4, probe_bits=2))
    assert h2 >= h1, (h1, h2)
    assert h2 >= 0.25, f"Hamming-2 recall@10 {h2:.2f}"
    assert mt >= 0.60, f"4-table Hamming-2 recall@10 {mt:.2f}"
    assert mt >= h2, (h2, mt)


def test_multitable_is_one_scan(vectors, query_vecs):
    """L tables must NOT mean L scans: the candidate filter is an OR of
    per-table bucket IN-lists over a single pass."""
    qv = next(iter(query_vecs.values()))
    df = sim.ann_topk_lsh_multitable(vectors, qv, k=K, n_tables=4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the L-scan antipattern would union L filtered scans; one pass =
    # no Union and a single cache scan (its cached-plan description may
    # also print the underlying FileScan once)
    assert "Union" not in plan
    assert plan.count("InMemoryTableScan") <= 1


def _l2_topk(vectors, qv, k=K):
    dist = sim.l2_sq(F.col("embedding"),
                     F.array(*[F.lit(float(v)) for v in qv]))
    return (vectors.select("vec_id", dist.alias("d"))
            .orderBy("d", "vec_id").limit(k))


def test_pq_adc_recall_and_training_gain(vectors, query_vecs):
    """PQ/ADC approximates EXACT-L2 top-k (its native metric). The
    deterministic first-16 codebooks must clear a recall floor, and
    per-subspace Lloyd training must not regress recall while strictly
    reducing the quantization error it optimizes (Lloyd monotonicity
    on the same objective)."""
    cbs0 = sim.pq_codebooks(vectors, m=8, k=16)
    cbs1 = sim.pq_codebooks_kmeans(vectors, m=8, k=16, iters=3)

    def recall(cbs):
        codes = sim.pq_encode(vectors, cbs).cache()
        total = 0.0
        for qid, qv in query_vecs.items():
            truth = _ids(_l2_topk(vectors, qv))
            got = _ids(sim.pq_adc_topk(codes, qv, cbs, k=K))
            total += len(truth & got) / K
        codes.unpersist()
        return total / len(query_vecs)

    e0 = sim.pq_quantization_error(vectors, cbs0)
    e1 = sim.pq_quantization_error(vectors, cbs1)
    assert e1 < e0                      # training reduced its objective
    r0, r1 = recall(cbs0), recall(cbs1)
    assert r0 >= 0.25                   # measured 0.35: 8-byte codes on
    assert r1 >= r0 - 0.1               # an isotropic 64-dim fixture is
    #                                     the honest ADC-only floor


def test_pq_rerank_recovers_recall(vectors, query_vecs):
    """ADC shortlist + exact rerank (the production search shape) must
    recover most of what 8-byte codes lose: measured 0.35 -> 0.70
    (det) / 0.74 (trained) at shortlist=50."""
    cbs = sim.pq_codebooks(vectors, m=8, k=16)
    codes = sim.pq_encode(vectors, cbs).cache()
    adc = rer = 0.0
    for qid, qv in query_vecs.items():
        truth = _ids(_l2_topk(vectors, qv))
        adc += len(truth & _ids(sim.pq_adc_topk(codes, qv, cbs, k=K))) / K
        rer += len(truth & _ids(sim.pq_adc_rerank_topk(
            codes, vectors, qv, cbs, k=K, shortlist=50))) / K
    codes.unpersist()
    adc /= len(query_vecs); rer /= len(query_vecs)
    assert rer >= adc and rer >= 0.6


def test_pq_encode_zero_shuffle(vectors):
    """The one full-corpus pass PQ takes must not shuffle: codebook
    literals ride the plan, encode is per-row."""
    cbs = sim.pq_codebooks(vectors, m=8, k=16)
    plan = (sim.pq_encode(vectors, cbs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_ivfpq_recall_and_pruned_scan(vectors, query_vecs):
    """Residual IVF-PQ with rerank: recall comparable to flat-PQ rerank
    while scanning only nprobe/8 of the lists. Also pins that the probe
    filter reaches the scan as a pushable predicate."""
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    cbs = sim.pq_residual_codebooks(vectors, cents, m=8, k=16)
    enc = sim.ivfpq_encode(vectors, cents, cbs).cache()
    tot = 0.0
    for qid, qv in query_vecs.items():
        truth = _ids(_l2_topk(vectors, qv))
        got = _ids(sim.ann_topk_ivfpq(enc, qv, cents, cbs,
                                      vectors_df=vectors, k=K,
                                      nprobe=2, shortlist=50))
        tot += len(truth & got) / K
    enc.unpersist()
    # nprobe=2 of 8 lists caps recall at list coverage; measured on the
    # isotropic fixture the 2 probed lists hold ~45% of true neighbors
    assert tot / len(query_vecs) >= 0.35
    qv = query_vecs[0]
    plan = (sim.ann_topk_ivfpq(enc, qv, cents, cbs, k=K)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "centroid_id" in plan and "IN" in plan.upper()


def test_knn_graph_within_clusters_matches_bruteforce(spark, vectors):
    """knn_graph_within_clusters must equal the numpy within-cell
    brute force exactly: per src, the k most-similar in-cell neighbors
    ordered by (round(cos,6) desc, dst), ranks dense from 1; no edge
    crosses cells; and the plan contains NO Window operator — the
    top-k is per-row array math after the single groupBy shuffle."""
    import numpy as np

    k = 4
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    got = sim.knn_graph_within_clusters(vectors, cents, k=k)
    rows = {(int(r["src"]), int(r["nn_rank"])): (int(r["dst"]),
                                                 float(r["cos_sim"]))
            for r in got.collect()}

    data = {int(r["vec_id"]): np.array(r["embedding"], dtype=float)
            for r in vectors.collect()}
    carr = {cid: np.array(v, dtype=float) for cid, v in cents}
    cell: dict[int, list[int]] = {}
    for vid, v in data.items():
        best = min(carr, key=lambda c: (float(np.sum((v - carr[c]) ** 2)), c))
        cell.setdefault(best, []).append(vid)

    expected = {}
    for members in cell.values():
        for src in members:
            cand = []
            for dst in members:
                if dst == src:
                    continue
                a, b = data[src], data[dst]
                cos = round(float(a @ b)
                            / (float(np.sqrt(a @ a)) * float(np.sqrt(b @ b))),
                            6)
                cand.append((-cos, dst))
            for rank, (negcos, dst) in enumerate(sorted(cand)[:k], start=1):
                expected[(src, rank)] = (dst, -negcos)
    assert set(rows) == set(expected)
    for key, (dst, cos) in expected.items():
        gdst, gcos = rows[key]
        assert gdst == dst and abs(gcos - cos) < 1e-9, (key, rows[key],
                                                        (dst, cos))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_nn_descent_recall_ladder(vectors):
    """NN-Descent rounds over the MIXED seed (within-cell knn UNION
    random-bucket knn) must climb toward the exact global k-NN graph
    (numpy brute force). Also pins the design constraint that forced
    the mixed seed: the cell-only seed is CLOSED under neighbor-of-
    neighbor expansion, so a round over it changes nothing."""
    import numpy as np

    from pyspark.sql import functions as F

    k = 5
    data = {int(r["vec_id"]): np.array(r["embedding"], dtype=float)
            for r in vectors.collect()}
    ids = sorted(data)
    M = np.stack([data[i] for i in ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    np.fill_diagonal(S, -np.inf)
    arr = np.array(ids)
    exact = {ids[i]: set(arr[np.argsort(-S[i])[:k]].tolist())
             for i in range(len(ids))}

    def recall(g) -> float:
        got: dict[int, set] = {}
        for r in g.collect():
            got.setdefault(int(r["src"]), set()).add(int(r["dst"]))
        return sum(len(got.get(i, set()) & exact[i])
                   for i in ids) / (k * len(ids))

    cents = sim.ivf_centroids(vectors, n_centroids=16)

    # cell-only seed: expansion provably confined to cells -> no-op
    cell = sim.knn_graph_within_clusters(vectors, cents, k=k) \
              .localCheckpoint()
    cell_refined = sim.nn_descent_round(cell, vectors, k=k)
    assert cell_refined.select("src", "dst") \
        .exceptAll(cell.select("src", "dst")).count() == 0

    rnd = sim.knn_random_seed(vectors, n_buckets=16, k=k)
    seed = (cell.select("src", "dst")
                .unionByName(rnd.select("src", "dst")).distinct()
                .localCheckpoint())
    g1 = sim.nn_descent_round(seed, vectors, k=k).localCheckpoint()
    g2 = sim.nn_descent_round(g1, vectors, k=k)
    r0, r1, r2 = recall(cell), recall(g1), recall(g2)
    print(f"nn-descent recall ladder: cell-seed={r0:.3f} "
          f"round1={r1:.3f} round2={r2:.3f}")
    assert r1 > r0
    assert r2 >= r1


def test_knn_graph_arrow_kernel_matches_reference(spark, vectors):
    """The Arrow production kernel must equal a numpy reference that
    replays its exact arithmetic ((M @ M.T)/outer(norms), np.round 6,
    lexsort tie-break), and agree with the oracle-pinned HOF kernel
    on >= 99% of edges (the remainder is last-ulp summation-order
    rounding, the documented delta)."""
    import numpy as np

    k = 4
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    got = {(int(r["src"]), int(r["nn_rank"])): (int(r["dst"]),
                                                float(r["cos_sim"]))
           for r in sim.knn_graph_within_clusters_arrow(
               vectors, cents, k=k).collect()}

    data = {int(r["vec_id"]): np.array(r["embedding"], dtype=float)
            for r in vectors.collect()}
    carr = {cid: np.array(v, dtype=float) for cid, v in cents}
    cell: dict[int, list[int]] = {}
    for vid, v in data.items():
        best = min(carr, key=lambda c: (float(np.sum((v - carr[c]) ** 2)), c))
        cell.setdefault(best, []).append(vid)

    expected = {}
    for members in cell.values():
        if len(members) < 2:
            continue
        ids = np.array(sorted(members))
        M = np.stack([data[i] for i in ids]).astype(np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        S = np.round((M @ M.T) / np.outer(norms, norms), 6)
        np.fill_diagonal(S, -np.inf)
        kk = min(k, len(ids) - 1)
        for i in range(len(ids)):
            cand = np.lexsort((ids, -S[i]))[:kk]
            for rank, j in enumerate(cand, start=1):
                expected[(int(ids[i]), rank)] = (int(ids[j]),
                                                 float(S[i][j]))
    assert got == expected

    hof = {(int(r["src"]), int(r["nn_rank"])): int(r["dst"])
           for r in sim.knn_graph_within_clusters(
               vectors, cents, k=k).collect()}
    agree = sum(1 for key, (dst, _) in got.items()
                if hof.get(key) == dst)
    assert agree / len(got) >= 0.99, agree / len(got)


def test_nn_descent_arrow_kernel_path(vectors):
    """The all-Arrow seed path must produce a graph of the same
    quality class as the HOF path: identical schema/contract, recall
    within 0.05 of the HOF-seeded result after one round."""
    import numpy as np

    k = 5
    data = {int(r["vec_id"]): np.array(r["embedding"], dtype=float)
            for r in vectors.collect()}
    ids = sorted(data)
    M = np.stack([data[i] for i in ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    np.fill_diagonal(S, -np.inf)
    arr = np.array(ids)
    exact = {ids[i]: set(arr[np.argsort(-S[i])[:k]].tolist())
             for i in range(len(ids))}

    def recall(g) -> float:
        got: dict[int, set] = {}
        for r in g.collect():
            got.setdefault(int(r["src"]), set()).add(int(r["dst"]))
        return sum(len(got.get(i, set()) & exact[i])
                   for i in ids) / (k * len(ids))

    cents = sim.ivf_centroids(vectors, n_centroids=16)
    r_hof = recall(sim.nn_descent(vectors, cents, k=k, rounds=1,
                                  random_buckets=16))
    r_arrow = recall(sim.nn_descent(vectors, cents, k=k, rounds=1,
                                    random_buckets=16, kernel="arrow"))
    assert abs(r_arrow - r_hof) <= 0.05, (r_arrow, r_hof)


def test_ivf_assign_arrow_matches_hof(spark, vectors):
    """The Arrow assign kernel (numpy matmul argmin, the production
    path for n_centroids-proportional-to-corpus regimes) must agree
    with the HOF struct-min assign row-for-row on the fixture —
    including the lowest-cid tie-break (centroid rows sorted by cid,
    np.argmin takes the first minimum). Round-11 measurement: at 200K
    vectors x 320 centroids the HOF assign alone took minutes; the
    arrow-assign + arrow-knn recipe runs the whole graph in ~5.6 s."""
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    hof = sim.ivf_assign(vectors, cents).select("vec_id", "centroid_id")
    arrow = (sim.ivf_assign_arrow(vectors, cents)
             .select("vec_id", F.col("centroid_id").alias("c2")))
    assert hof.join(arrow, "vec_id") \
              .filter("centroid_id <> c2").count() == 0
    assert arrow.count() == hof.count()


def test_knn_arrow_assign_kernel_same_graph(spark, vectors):
    """knn_graph_within_clusters_arrow(assign='arrow') must produce
    the same edge set as assign='hof' when no centroid-distance ties
    exist (the fixture's perturbed vectors have distinct distances)."""
    cents = sim.ivf_centroids(vectors, n_centroids=8)
    a = {(int(r["src"]), int(r["nn_rank"]), int(r["dst"]))
         for r in sim.knn_graph_within_clusters_arrow(
             vectors, cents, k=4).collect()}
    b = {(int(r["src"]), int(r["nn_rank"]), int(r["dst"]))
         for r in sim.knn_graph_within_clusters_arrow(
             vectors, cents, k=4, assign="arrow").collect()}
    assert a == b


def test_scaled_arrow_graph_equals_hof_graph(vectors):
    """The registry-resident production recipe (corpus-scaled quantizer
    + Arrow matmul kernels) must produce the SAME graph as the
    interpreted HOF kernels on the same centroids — the cross-kernel
    exactness pin behind knn_graph_scaled_embeddings."""
    n = sim.scaled_centroid_count(vectors.count())
    cents = sim.ivf_centroids(vectors, n_centroids=n)
    hof = {(r["src"], r["dst"], r["nn_rank"], r["cos_sim"])
           for r in sim.knn_graph_within_clusters(
               vectors, cents, k=5).collect()}
    arrow = {(r["src"], r["dst"], r["nn_rank"], r["cos_sim"])
             for r in sim.knn_graph_within_clusters_arrow(
                 vectors, cents, k=5, assign="arrow").collect()}
    assert arrow == hof and len(hof) > 0


def test_scaled_centroid_count_rule():
    assert sim.scaled_centroid_count(500) == 7
    assert sim.scaled_centroid_count(5000) == 78
    assert sim.scaled_centroid_count(50) == 4          # floor
    assert sim.scaled_centroid_count(6_400_000) == 100_000


def test_arrow_pairs_kernel_equals_hof_pairs(vectors):
    """The Arrow matmul pair kernel behind semantic_dedup_pairs_scaled
    must produce the SAME pairs as the interpreted HOF kernel on the
    same assignment (including the max_group_size drop semantics)."""
    n = sim.scaled_centroid_count(vectors.count())
    cents = sim.ivf_centroids(vectors, n_centroids=n)
    assigned = sim.ivf_assign(vectors, cents)
    for cap in (None, 60):
        hof = {(r["id_a"], r["id_b"], r["cos_sim"])
               for r in sim._pairs_within_key(
                   assigned, "centroid_id", 0.3, n,
                   "embedding", "vec_id", cap).collect()}
        arrow = {(r["id_a"], r["id_b"], r["cos_sim"])
                 for r in sim._pairs_within_key_arrow(
                     assigned, "centroid_id", 0.3,
                     "embedding", "vec_id", cap).collect()}
        assert arrow == hof
    assert hof  # the capped run still keeps some clusters


def test_semantic_dedup_scaled_is_capped_by_default():
    import inspect
    sig = inspect.signature(sim.semantic_dedup_pairs_scaled)
    assert sig.parameters["max_cluster_size"].default == 4096


def test_pairs_kernels_agree_on_zero_norm_vectors(spark):
    """ADVICE r12: before the shared pre-filter, a zero-norm vector's
    pair read NaN in both kernels but only the HOF emitted it (Spark
    orders NaN greatest, numpy's NaN >= t is false). Both kernels must
    now DROP zero-norm rows before pairing and before size checks."""
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
            (3, [0.0, 0.0], 0),                      # zero-norm
            (4, [0.0, 0.0], 1), (5, [0.0, 0.0], 1)]  # all-degenerate group
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, centroid_id int")
    hof = {(r["id_a"], r["id_b"], r["cos_sim"])
           for r in sim._pairs_within_key(
               df, "centroid_id", 0.5, 2, "embedding", "vec_id").collect()}
    arrow = {(r["id_a"], r["id_b"], r["cos_sim"])
             for r in sim._pairs_within_key_arrow(
                 df, "centroid_id", 0.5, "embedding", "vec_id").collect()}
    assert arrow == hof == {(1, 2, 1.0)}


def test_zero_norm_rows_do_not_count_toward_group_cap(spark):
    """Size caps count SURVIVORS: a group of 3 with one zero-norm row
    passes a max_group_size=2 cap in both kernels."""
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, centroid_id int")
    for fn, kw in ((sim._pairs_within_key, dict(n_parts=2)),
                   (sim._pairs_within_key_arrow, {})):
        got = {(r["id_a"], r["id_b"], r["cos_sim"])
               for r in fn(df, "centroid_id", 0.5, vec_col="embedding",
                           id_col="vec_id", max_group_size=2,
                           **kw).collect()}
        assert got == {(1, 2, 1.0)}, fn.__name__
