"""Per-entry 10x scale evidence: direct probe row OR archetype link.

Round-9/10 verdicts asked that every registry entry carry
machine-checked scale evidence. 84 entries have DIRECT 10x probe rows
in ``scale_probe_results.json`` (tools/scale_probe.py). The rest share
a plan archetype with a measured entry — same shuffle/partition shape,
so the measured exponent transfers. This module is that mapping as a
reviewable artifact:

    python tools/archetypes.py          # lint: every entry covered?
    python tools/archetypes.py --write  # render the SCALE.md block

``tests/test_archetype_map.py`` runs the lint in CI: every registry
entry must be directly probed or mapped to a DIRECTLY PROBED archetype
(no archetype chains), and the map must not carry stale names.

The mapping is hand-authored on the PLAN shape (what shuffles, what
stays per-row, what is windowed over what key), not on the query's
business meaning — the reason strings say which mechanism is shared.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# entry -> (measured archetype entry, shared-mechanism reason)
ARCHETYPES: dict[str, tuple[str, str]] = {
    # --- CDC scans: pushed-filter parquet scan (+align/cast), no agg
    # beyond O(1)-row; the headline IS this plan measured end-to-end.
    "cdc_time_window_events": ("headline_sync_lineitem",
                               "bounded ts-window pushed-filter scan"),
    "cdc_custom_sql_orders": ("headline_sync_lineitem",
                              "sanitized predicate scan, same scan+filter plan"),
    "cdc_hybrid_lineitem_ties": ("headline_sync_lineitem",
                                 "hybrid (ts,id) watermark scan — the headline's filter"),
    "cdc_timestamp_only_events": ("headline_sync_lineitem",
                                  "ts-only watermark scan"),
    "cdc_id_only_ceiling_events": ("headline_sync_lineitem",
                                   "id-range pushed-filter scan"),
    "cdc_full_sync_region": ("headline_sync_lineitem",
                             "unfiltered scan of a dimension table"),
    "align_orders_to_target": ("headline_sync_lineitem",
                               "per-row cast/rename projection — the align stage of the sync"),
    "cast_suite_lineitem": ("headline_sync_lineitem",
                            "per-row cast projection, zero shuffle"),
    # --- one-pass scan aggregates (map-side partials, O(1)-row output)
    "watermark_extract_orders": ("pricing_summary_lineitem",
                                 "full-scan max(struct) agg, O(1)-row output"),
    "quality_metrics_lineitem": ("pricing_summary_lineitem",
                                 "one-pass multi-metric agg"),
    "verify_counts": ("checksum_audit_orders",
                      "metadata/count verification agg"),
    "constraint_audit_orders": ("checksum_audit_orders",
                                "rule-violation count agg, same one-pass shape"),
    "table_checksum_orders": ("checksum_audit_orders",
                              "commutative bit_xor checksum agg"),
    "corr_matrix_lineitem": ("pricing_summary_lineitem",
                             "one-pass moment agg (d^2 agg states, O(1) rows out)"),
    "unpivot_measure_stats_lineitem": ("pricing_summary_lineitem",
                                       "stack/unpivot projection + one-pass agg"),
    "multimodal_payload_stats": ("pricing_summary_lineitem",
                                 "per-row JVM binary length/crc + one-pass agg"),
    "topk_orders_by_price": ("pricing_summary_lineitem",
                             "scan + TakeOrderedAndProject — strictly cheaper than the full agg"),
    # --- groupBy aggregates (shuffle on low-cardinality keys)
    "retract_agg_orders": ("revenue_by_nation",
                           "groupBy agg with retraction rows, same shuffle"),
    "temperature_mixture_by_source": ("revenue_by_nation",
                                      "per-source agg + O(sources) weight math"),
    "mixture_plan_by_source": ("revenue_by_nation",
                               "per-source agg, O(sources) output"),
    "skew_report_orders": ("revenue_by_nation",
                           "key-frequency agg + moments"),
    "key_skew_profile_events": ("revenue_by_nation",
                                "key-frequency agg + moments"),
    "zscore_outliers_events": ("revenue_by_nation",
                               "stats agg + broadcast-back filter"),
    "dup_rate_by_source": ("exact_dedup_documents",
                           "hash groupBy + per-source rate agg"),
    "normalized_dedup_documents": ("exact_dedup_documents",
                                   "normalize projection + hash groupBy"),
    "pivot_status_by_priority": ("revenue_rollup_flag_status",
                                 "pivot = grouped agg over literal columns"),
    # --- time-bucketed aggregates
    "density_stats_events": ("tumbling_daily_events",
                             "time-bucket groupBy count"),
    "dow_seasonality_events": ("tumbling_daily_events",
                               "calendar-key groupBy"),
    "value_histogram_events": ("tumbling_daily_events",
                               "width_bucket groupBy count"),
    "purchase_value_daily_gapfilled": ("tumbling_daily_events",
                                       "daily agg + O(days) sequence fill"),
    "forecast_revenue_change": ("tumbling_daily_events",
                                "daily agg + O(days) window regression"),
    # --- multi-join relational (TPC-H shapes; all dims broadcast or
    # co-partitioned, measured members span the family)
    "promo_revenue_share": ("supplier_revenue_by_nation",
                            "part-dim join + conditional agg (Q14)"),
    "disjunctive_pred_part_revenue": ("supplier_revenue_by_nation",
                                      "broadcast dim join + OR-predicate scan (Q19)"),
    "important_parts_share": ("tpch_q11", "partsupp share agg (Q11 twin)"),
    "supplier_count_by_part_attrs": ("tpch_q16", "anti-join + distinct agg (Q16 twin)"),
    "excess_shipped_suppliers": ("tpch_q20", "nested semi-join chain (Q20 twin)"),
    "small_qty_part_revenue": ("min_cost_supplier_per_part",
                               "pre-agg + same-key rejoin decorrelation (Q17)"),
    "above_avg_idle_customers": ("waiting_multi_supplier_orders",
                                 "decorrelated avg subquery + anti-join (Q22)"),
    # --- semi/anti joins
    "manifest_anti_join": ("bloom_semi_join_orders",
                           "left_anti on file keys, same build/probe shape"),
    "intersect_click_purchase_users": ("bloom_semi_join_orders",
                                       "set intersection as semi-join"),
    # --- partitioned window / sequence analytics (shuffle on entity
    # key, in-partition sort; funnel_ordered_events is the measured rep)
    "latest_record_per_user": ("funnel_ordered_events",
                               "row_number over entity-partitioned window"),
    "events_since_last_purchase": ("funnel_ordered_events",
                                   "rows-frame max(CASE) over entity window"),
    "asof_click_attribution": ("funnel_ordered_events",
                               "as-of = last-non-null over entity window"),
    "user_event_sequences": ("funnel_ordered_events",
                             "collect_list over entity-partitioned sort"),
    "funnel_conversion_events": ("funnel_ordered_events",
                                 "ordered-step funnel twin"),
    "rolling_hour_avg_value": ("cohort_retention_weekly_events",
                               "time-range window agg per key"),
    "cohort_retention_events": ("cohort_retention_weekly_events",
                                "cohort x offset agg twin"),
    "pack_sequences_documents": ("funnel_ordered_events",
                                 "running-sum window partitioned by pack key"),
    # --- sketches / approx aggregates (mergeable state)
    "hll_union_distinct_users": ("cms_heavy_hitters_documents",
                                 "mergeable sketch groupBy + union"),
    "kmv_distinct_by_source": ("cms_heavy_hitters_documents",
                               "KMV sketch per group — bounded state agg"),
    "kmv_union_sources": ("cms_heavy_hitters_documents",
                          "KMV union — sketch merge"),
    # --- per-row JVM text/vector kernels (zero shuffle + small agg)
    "sanitize_scrub_customer": ("boilerplate_scrub_documents",
                                "per-row string scrub projection"),
    "normalize_text_documents": ("boilerplate_scrub_documents",
                                 "per-row unicode/whitespace normalize"),
    "pii_scrub_customer": ("boilerplate_scrub_documents",
                           "per-row regex scrub"),
    "gopher_quality_documents": ("text_stats_documents",
                                 "per-row text heuristics + flags"),
    "lang_id_documents": ("text_stats_documents",
                          "per-row n-gram profile score"),
    "corpus_stats_by_source": ("text_stats_documents",
                               "per-row text stats + per-source agg"),
    "oov_rate_documents": ("tfidf_top_terms_documents",
                           "token explode + vocab join + rate agg"),
    "vocab_top20_documents": ("tfidf_top_terms_documents",
                              "token explode + count + top-k"),
    "token_kl_by_source": ("tfidf_top_terms_documents",
                           "token counts per source + global join + KL fold"),
    "lexical_diversity_by_source": ("bpe_fertility_by_source",
                                    "per-source token distinct/total agg"),
    "gopher_pass_rates_by_source": ("ccnet_buckets_by_source",
                                    "per-source quality-rate agg"),
    "quantize_int8_embeddings": ("embedding_norms",
                                 "per-row vector transform, zero shuffle"),
    "label_centroids_embeddings": ("embedding_dim_stats",
                                   "per-label vector mean — posexplode + groupBy dim"),
    "embedding_drift_halves": ("embedding_dim_stats",
                               "per-dim moments on two halves"),
    "cosine_topk_embeddings": ("mmr_topk_embeddings",
                               "brute cosine + top-k (mmr adds the greedy re-rank)"),
    "batch_cosine_topk_embeddings": ("mmr_topk_embeddings",
                                     "K-query one-pass cosine scan + per-query window"),
    "ann_lsh_topk_embeddings": ("ann_lsh_multiprobe_topk",
                                "single-probe subset of the multiprobe plan"),
    # --- fingerprint / chunk per-row kernels
    "fingerprint_documents": ("winnowing_dup_fingerprints_documents",
                              "rolling-hash fingerprint subset (no window min)"),
    "chunk_documents_windowed": ("duplicated_spans_documents",
                                 "overlapping chunk explode, same row growth"),
    "minhash_signatures_documents": ("minhash_lsh_pairs_documents",
                                     "signature pipeline prefix of the pair job"),
    # --- sampling / split / ordering gates (seeded hash per row)
    "train_val_test_split_documents": ("curriculum_interleave_documents",
                                       "seeded hash gate per row, zero shuffle"),
    "importance_sample_documents": ("curriculum_interleave_documents",
                                    "weighted hash gate"),
    "mixture_sample_by_source": ("curriculum_interleave_documents",
                                 "per-source rate hash gate"),
    "stratified_sample_by_source": ("curriculum_interleave_documents",
                                    "per-stratum hash gate"),
    "weighted_sample_per_source": ("funnel_ordered_events",
                                   "A-res keys + per-source rank window"),
    # --- layout / maintenance
    "zorder_keys_events": ("hilbert_keys_events",
                           "bit-interleave per-row (Morton is the cheaper sibling)"),
    "zorder3_keys_events": ("hilbert_keys_events",
                            "3-D Morton interleave"),
    "compaction_plan_orders": ("checksum_audit_orders",
                               "O(files) footer-metadata relation, no data scan"),
    # --- Python/Arrow kernels
    "multimodal_features": ("video_metadata_documents",
                            "Arrow-batched Python decode kernel"),
    "frame_sample_documents": ("keyframe_slices_documents",
                               "bounded k-frame sampling twin"),
    # --- fuzzy matching
    # --- calibration twins
}


def lint() -> list[str]:
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401

    probed = set(json.load(
        open(os.path.join(REPO, "scale_probe_results.json"))))
    errors = []
    for name in REGISTRY:
        if name in probed:
            if name in ARCHETYPES:
                errors.append(f"{name}: both probed and mapped — drop "
                              "the mapping (direct row wins)")
            continue
        if name not in ARCHETYPES:
            errors.append(f"{name}: no 10x probe row and no archetype")
            continue
        arch, _ = ARCHETYPES[name]
        if arch not in probed:
            errors.append(f"{name}: archetype {arch} is not directly "
                          "probed (chains not allowed)")
    for name in ARCHETYPES:
        from s3_redshift_backup_tool_spark.parity import REGISTRY as R
        if name not in R:
            errors.append(f"stale mapping: {name} not in registry")
    return errors


def render() -> str:
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401

    probe = json.load(open(os.path.join(REPO, "scale_probe_results.json")))
    lines = [
        "<!-- archetype-map:start (auto-written by tools/archetypes.py) -->",
        "## Per-entry 10x scale evidence (direct probe or archetype link)",
        "",
        f"{sum(1 for n in REGISTRY if n in probe)} of {len(REGISTRY)} "
        "registry entries carry a DIRECT 10x probe row "
        "(`scale_probe_results.json`, wall ratio for 10x data, plan "
        "shape asserted identical). Every remaining entry is mapped to "
        "a directly-probed plan archetype below — same shuffle/"
        "partition/window mechanism, so the measured exponent "
        "transfers; `tests/test_archetype_map.py` lint-checks "
        "completeness (no unmapped entry, no unprobed archetype, no "
        "stale names).",
        "",
        "| entry | evidence | x10 wall | mechanism shared with archetype |",
        "|---|---|---|---|",
    ]
    for name in REGISTRY:
        if name in probe:
            lines.append(f"| {name} | direct | "
                         f"x{probe[name]['time_ratio']} | — |")
        else:
            arch, reason = ARCHETYPES[name]
            lines.append(f"| {name} | = {arch} | "
                         f"x{probe[arch]['time_ratio']} | {reason} |")
    lines.append("<!-- archetype-map:end -->")
    return "\n".join(lines)


def main() -> None:
    errors = lint()
    if errors:
        print("ARCHETYPE LINT FAILURES:")
        for e in errors:
            print(" -", e)
        sys.exit(1)
    print("archetype map complete: every registry entry has a direct "
          "probe row or a probed archetype")
    if "--write" in sys.argv:
        import re
        block = render()
        scale = os.path.join(REPO, "SCALE.md")
        text = open(scale).read()
        pat = re.compile(r"<!-- archetype-map:start.*?"
                         r"<!-- archetype-map:end -->", re.S)
        text = pat.sub(block, text) if pat.search(text) \
            else text.rstrip() + "\n\n" + block + "\n"
        open(scale, "w").write(text)
        print("SCALE.md archetype block written")


if __name__ == "__main__":
    main()
