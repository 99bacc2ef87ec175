"""Physical-plan quality guards.

Correctness tests say WHAT each operator returns; these say HOW — the
properties that decide whether the same plan survives a 100x scale-up:
predicate pushdown reaching the scan, broadcast joins for dims, top-k
without a global sort, shuffle-free per-row kernels, partial (map-side)
aggregation, and column pruning. A refactor that silently regresses one
of these still passes the oracle checks; it fails here.
"""

from __future__ import annotations

import pytest

from s3_redshift_backup_tool_spark.parity import REGISTRY
import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401


def final_plan(df, mode: str | None = None) -> str:
    """Execute (so AQE finalizes) and return the physical plan string.
    ``mode="formatted"`` returns the full explain output (plain toString
    truncates long FileScan lines, hiding PushedFilters tails)."""
    df.collect()
    qe = df._jdf.queryExecution()
    if mode == "formatted":
        jvm = df.sparkSession._jvm
        return qe.explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    return qe.executedPlan().toString()


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    def _plan(name: str, mode: str | None = None) -> str:
        return final_plan(REGISTRY[name].fn(spark, sf_dir), mode)
    return _plan


def test_cdc_keyset_predicate_pushed_to_scan(plan):
    """S2: the hybrid (ts,id) keyset predicate must reach the parquet
    scan as PushedFilters — at 100 TB this is the difference between
    reading the delta and reading the table."""
    p = plan("cdc_hybrid_lineitem_ties", mode="formatted")
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    assert pushed, "no scan with PushedFilters in plan"
    assert "l_shipdate" in pushed
    # P2 additional_where conjunct is pushed too
    assert "EqualTo(l_returnflag,R)" in pushed


def test_projection_prunes_scan_columns(plan):
    """A 2-column projection must reach the scan: ReadSchema holds only
    the projected columns, not the full table."""
    p = plan("topk_orders_by_price")
    scan = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "o_orderpriority" not in scan and "o_orderstatus" not in scan


def test_dim_joins_broadcast(plan):
    """§2.3: multi-way star join must broadcast the small sides, never
    cartesian, never shuffle the fact table more than once per key."""
    p = plan("revenue_by_nation")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_no_forced_broadcast_of_scaling_tables(spark, sf_dir):
    """Broadcast hints are allowed ONLY on fixed-cardinality dims (nation,
    region) or bounded singleton aggregates. customer/supplier/part scale
    with data size: a forced hint overrides AQE's size check and OOMs
    executors at 100x scale (round-1 verdict finding). AQE still
    broadcasts them at small SF — but size-driven, not hint-forced."""
    allowed = ("n_nationkey", "r_regionkey",  # fixed-cardinality dims
               "__best")                      # 1-row aggregate (Q15 max)
    for name in ["revenue_by_nation", "shipping_priority_top10",
                 "supplier_revenue_by_nation", "large_volume_orders",
                 "small_qty_part_revenue", "part_type_revenue_share",
                 "volume_shipping_pair_nations", "market_share_by_year",
                 "returned_item_top_customers", "top_supplier_by_revenue"]:
        df = REGISTRY[name].fn(spark, sf_dir)
        lines = df._jdf.queryExecution().analyzed().toString().splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line:
                continue
            subtree = "\n".join(lines[i + 1:i + 8])
            assert any(tok in subtree for tok in allowed), \
                f"{name}: broadcast hint wraps a scaling table:\n{subtree}"


def test_topk_avoids_global_sort(plan):
    """O4/top-k: orderBy+limit must compile to TakeOrderedAndProject
    (per-partition heaps + k-row driver merge), not a full sort shuffle."""
    p = plan("cosine_topk_embeddings")
    assert "TakeOrderedAndProject" in p


def test_minhash_is_shuffle_free(plan):
    """Signature computation is per-row array math: no hash-partitioned
    exchange anywhere (the only allowed exchange is fan_out's round-robin
    spread of an under-split source)."""
    p = plan("minhash_signatures_documents")
    assert "hashpartitioning" not in p


def test_minhash_md5_runs_once(spark, sf_dir):
    """The shingle md5 array must appear exactly once in the OPTIMIZED
    plan: a posexplode over the signature expression gets inlined into
    the Generate node, duplicating the md5 transform into every affine
    reference (17 copies, measured ~25x slower at sf0.1)."""
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    df = REGISTRY["minhash_signatures_documents"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("md5") == 1, f"md5 duplicated {opt.count('md5')}x"
    # lsh_pairs legitimately has 2: one shingle digest + one band hash.
    # The broken (inlined) form had 9.
    lsh = REGISTRY["minhash_lsh_pairs_documents"].fn(spark, sf_dir)
    opt = lsh._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("md5") == 2, f"md5 duplicated {opt.count('md5')}x"


def test_simhash_is_shuffle_free(plan):
    p = plan("simhash_documents")
    assert "hashpartitioning" not in p


def test_aggregation_is_partial(plan):
    """A2/A9-style aggs must show map-side partial aggregation (two
    HashAggregate levels), so the shuffle carries group states, not rows."""
    p = plan("pricing_summary_lineitem")
    assert p.count("HashAggregate") >= 2


def test_manifest_antijoin_stays_antijoin(plan):
    """P5: the blacklist exclusion must be a (broadcastable) anti-join,
    not a filter over a collected list."""
    p = plan("manifest_anti_join")
    assert "LeftAnti" in p


def test_session_window_partitioned_by_user(plan):
    """§2.12: session windows must partition by user key — a global
    (unpartitioned) window would serialize 100 TB through one task."""
    p = plan("session_windows_events")
    assert "session_window" in p
    assert "SinglePartition" not in p


def test_q17_decorrelation_broadcasts_part(plan):
    """Q17 shape: the correlated subquery must decorrelate into a
    pre-aggregate rejoined on l_partkey (sort-merge or shuffle-hash on
    the shared key) with the tiny part dim broadcast — no per-row
    subquery, no cartesian."""
    p = plan("small_qty_part_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_decontamination_probe_cannot_multiply(plan):
    """The train-membership probe must be pure set membership — it may
    never multiply matching eval postings. The r13 one-pass shape is a
    LeftOuter join whose build side is DISTINCT on the join key (a
    keyed aggregate directly under the join), which preserves that
    guarantee while folding the old semi-join + sizes-join into a
    single groupBy; an Inner/unkeyed shape would break it."""
    p = plan("decontamination_eval_overlap")
    assert "LeftOuter" in p and "Inner" not in p
    # the build side is deduplicated: a grouping-only aggregate on
    # shingle feeds the join (distinct train shingles)
    assert "HashAggregate(keys=[shingle" in p
    assert "CartesianProduct" not in p


def test_pack_sequences_window_is_partitioned(plan):
    """Packing must parallelize across bucket streams — a global cumsum
    window (SinglePartition) would serialize 100 TB through one task."""
    p = plan("pack_sequences_documents")
    assert "Window" in p
    assert "SinglePartition" not in p


def test_repetition_signals_partial_agg(plan):
    p = plan("repetition_signals_documents")
    assert p.count("HashAggregate") >= 2       # map-side partials
    assert "CartesianProduct" not in p


def test_disjunctive_predicate_splits_below_join(plan):
    """Q19 shape: the OR-of-conjunctions must not force a nested-loop
    join; single-side conjuncts get pushed to the scans."""
    p = plan("disjunctive_pred_part_revenue", mode="formatted")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    # the brand/size disjunction reaches the part scan
    assert "p_brand" in pushed and "l_quantity" in pushed


def test_q21_semi_anti_stay_hash_joins(plan):
    """Q21 shape: correlated EXISTS/NOT EXISTS must decorrelate into
    LeftSemi/LeftAnti hash joins on the order key, never per-row
    subqueries or nested loops."""
    p = plan("waiting_multi_supplier_orders")
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_batch_cosine_broadcasts_queries(plan):
    """Batch similarity join: the K query vectors are the broadcast
    side; the corpus is scanned once (exactly one embeddings scan in
    the plan) and only score triples reach the ranking shuffle."""
    p = plan("batch_cosine_topk_embeddings")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    shuffles = [l for l in p.splitlines()
                if "Exchange" in l and "BroadcastExchange" not in l]
    assert shuffles and all("query_id" in l for l in shuffles), shuffles


def test_q10_topk_avoids_global_sort(plan):
    """Q10: the revenue top-20 must be TakeOrderedAndProject, not a full
    sort shuffle of the aggregated customers."""
    assert "TakeOrderedAndProject" in plan("returned_item_top_customers")


def test_dup_span_shuffles_hash_not_text(plan):
    """Chunk-dup detection must shuffle on the 64-bit chunk hash only:
    the chunk strings themselves never enter an exchange."""
    p = plan("dup_span_chunks_documents")
    parts = [l for l in p.splitlines() if "hashpartitioning" in l]
    assert parts, "expected one hash exchange on chunk_hash"
    assert all("chunk_hash" in l for l in parts)
    assert all("chunk#" not in l for l in parts)


def test_pii_scrub_is_narrow(plan):
    """Redaction is a per-row regexp chain: zero exchanges."""
    assert "Exchange" not in plan("pii_scrub_customer")


def test_rolling_window_partitioned_by_user(plan):
    """The time-RANGE rolling mean must keep its per-user partition spec
    (an empty partition spec serializes the whole table through one
    task)."""
    p = plan("rolling_hour_avg_value")
    win = [l for l in p.splitlines() if "Window" in l and "avg" in l]
    assert win and all("user_id" in l for l in win)


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime row-level pruning: a selective filter on the dim side of a
    shuffle join injects a bloom_filter_agg that pre-filters the fact
    scan (Spark's runtime bloom join, on by default). Production
    thresholds (10GB application side) are lowered here to demonstrate
    injection on fixture-sized data; at 100 TB the defaults fire on
    their own."""
    from pyspark.sql import functions as F
    from s3_redshift_backup_tool_spark.sources.readers import read_table

    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold"]}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, sf_dir, "lineitem")
        orders = (read_table(spark, sf_dir, "orders")
                  .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .groupBy("o_orderpriority").count())
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt
        assert j.count() > 0  # and it still runs
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q6_predicates_all_pushed(plan):
    """Q6 is the canonical pushdown probe: every predicate (date range,
    discount band, quantity cap) must reach the scan as PushedFilters."""
    p = plan("forecast_revenue_change", mode="formatted")
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_gopher_and_importance_are_narrow(plan):
    """Round-4 per-row gates (Gopher rules, importance/mixture sampling)
    must stay pure narrow plans: no exchange of any kind."""
    for name in ("gopher_quality_documents", "importance_sample_documents",
                 "mixture_sample_by_source"):
        p = plan(name)
        assert "Exchange" not in p, f"{name} shuffles"


def test_bm25_topk_and_broadcasts(plan):
    """BM25: top-k must be TakeOrderedAndProject (no global sort); the
    df and corpus-stats relations must arrive via broadcast, so the only
    hash exchange keys on the per-(doc, term) tf groupBy."""
    p = plan("bm25_search_documents")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_cms_sketch_aggregates_map_side(plan):
    """The sketch groupBy must partial-aggregate (two HashAggregate
    levels) so the exchange carries <= depth*width counter rows per
    partition, never raw token rows; and the token md5 must run once
    (affine mixes derive the depth bucket rows)."""
    p = plan("cms_heavy_hitters_documents")
    assert p.count("HashAggregate") >= 2


def test_cms_md5_runs_once_per_side(spark, sf_dir):
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    df = REGISTRY["cms_heavy_hitters_documents"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # 3 legitimate digests: sketch tokens, candidate terms, exact-count
    # tokens. The salted-md5 form had 4 per token row alone.
    assert opt.count("md5") <= 3, f"md5 duplicated {opt.count('md5')}x"


def test_zscore_stats_join_is_broadcast(plan):
    """The per-group stats relation (1 row per group) must broadcast
    back onto the fact side — the fact table is never hash-exchanged."""
    p = plan("zscore_outliers_events", mode="formatted")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_winnowing_md5_runs_once(spark, sf_dir):
    """The shingle md5 array must be a materialized attribute, not an
    inline expression re-evaluated per window position (which would be
    quadratic per doc — the minhash Generate-inlining lesson)."""
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    df = REGISTRY["winnowing_dup_fingerprints_documents"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("md5") == 1, f"md5 duplicated {opt.count('md5')}x"


# -- TPC-H family completion (round 4): plan pins ---------------------------

def test_promo_revenue_pushes_shipdate_filter(plan):
    """Q14: the ship-date range must reach the lineitem scan — at scale
    this is partition/row-group pruning on the fact table."""
    p = plan("promo_revenue_share", mode="formatted")
    pushed = " ".join(l for l in p.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed


def test_q16_excludes_suppliers_via_anti_join(plan):
    """Q16: the NOT-IN complaints exclusion compiles to an anti join
    (broadcast at this dim size), never a per-row subquery."""
    p = plan("supplier_count_by_part_attrs")
    assert "LeftAnti" in p


def test_q20_semi_join_chain(plan):
    """Q20: both IN clauses become semi joins — no row duplication, the
    supplier table touched once."""
    p = plan("excess_shipped_suppliers")
    assert p.count("LeftSemi") >= 2


def test_q2_single_lineitem_scan_two_exchanges(plan):
    """Q2: the window-min decorrelation reads lineitem ONCE (the
    groupBy-min + rejoin form computed the unit aggregate twice —
    aliased self-consumption defeats exchange reuse) and the tie-break
    window adds no exchange beyond the two the aggregation needs."""
    p = plan("min_cost_supplier_per_part").split("== Initial Plan ==")[0]
    assert p.count("lineitem.parquet") == 1
    assert p.count("hashpartitioning(l_partkey") <= 2


def test_no_cartesian_product_anywhere(spark, sf_dir):
    """Global guard over EVERY registry query's optimized plan: a
    missing join condition compiles to CartesianProduct and is a
    silent O(n*m) bomb at scale. 1-row broadcast scalars legitimately
    plan as BroadcastNestedLoopJoin and are allowed."""
    bad = []
    for name, spec in REGISTRY.items():
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution() \
                .sparkPlan().toString()
        except Exception as e:          # noqa: BLE001
            bad.append(f"{name}: plan failed: {e}")
            continue
        # physical node check: 1-row scalar joins legitimately plan as
        # BroadcastNestedLoopJoin; CartesianProduct is the bomb
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct in physical plan")
    assert not bad, bad


def test_ccnet_buckets_avoid_global_ntile(plan):
    """The CCNet tercile split must never run the global ntile window
    (a full sort into ONE partition at 100 TB): the default plan is the
    distributed exact-ntile (range exchange + closed-form bucket)."""
    p = plan("ccnet_buckets_by_source")
    assert "ntile" not in p


def test_id_gap_audit_window_is_partitioned(spark, sf_dir):
    """The gap audit's data-side lag must be partition-parallel: range
    exchange + window partitioned by partition id; the only global
    window is over the O(partitions)-row bounds relation."""
    from s3_redshift_backup_tool_spark.operators.quality import id_gap_audit
    from s3_redshift_backup_tool_spark.sources.readers import read_table
    orders = read_table(spark, sf_dir, "orders")
    out = id_gap_audit(orders, "o_orderkey", num_partitions=8,
                       checkpoint=False)
    p = final_plan(out)
    assert "rangepartitioning(id" in p
    assert "partitionBy=[__pid]" in p or "__pid" in p


def test_keyset_page_and_distribution_windows_are_partitioned(plan):
    """Global row_number / ntile / cume_dist queries must run on the
    distributed-rank path: every window in the executed plan is the
    O(partitions)-row offsets window, never a data-wide global sort."""
    for name in ("keyset_page_orders", "ntile_cumedist_customers"):
        p = plan(name)
        assert "ntile" not in p and "cume_dist" not in p
        for line in p.splitlines():
            if "windowspecdefinition" in line:
                assert "__pid" in line, (name, line.strip()[:120])
