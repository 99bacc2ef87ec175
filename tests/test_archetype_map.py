"""Lint: every registry entry carries 10x scale evidence — a direct
probe row in scale_probe_results.json or a mapping to a directly-probed
plan archetype (tools/archetypes.py). Chains and stale names are
errors; so is shadowing a direct row with a mapping."""
from tools.archetypes import lint


def test_every_entry_has_scale_evidence():
    errors = lint()
    assert not errors, "\n".join(errors)


def test_scale_md_block_is_current():
    """The rendered SCALE.md table must match the map (regenerate with
    python tools/archetypes.py --write after registry changes)."""
    import re

    from tools.archetypes import render
    text = open("SCALE.md").read()
    m = re.search(r"<!-- archetype-map:start.*?<!-- archetype-map:end -->",
                  text, re.S)
    assert m, "SCALE.md missing the archetype-map block"
    assert m.group(0) == render(), (
        "SCALE.md archetype block is stale — run "
        "python tools/archetypes.py --write")


def test_superlinear_direct_rows_carry_annotation_links():
    """r12 verdict item 3: a direct probe row above x8 with '—' in the
    SCALE.md table is an unexplained superlinear reading — the
    adjudication exists in PERF.md's annotations but the table reader
    can't find it. Every such row must link its annotation."""
    import json

    from tools.archetypes import (ANNOTATION_REQUIRED_ABOVE,
                                  annotation_ref)
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401

    probe = json.load(open("scale_probe_results.json"))
    unexplained = {
        n: probe[n]["time_ratio"] for n in REGISTRY
        if n in probe
        and probe[n].get("time_ratio", 0) > ANNOTATION_REQUIRED_ABOVE
        and not annotation_ref(n)}
    assert not unexplained, unexplained


def test_annotation_ref_format():
    from tools.archetypes import annotation_ref
    assert annotation_ref("semantic_dedup_pairs_embeddings") \
        == "PERF.md ann. 7"
    assert annotation_ref("knn_graph_embeddings") == "PERF.md ann. 11"
    assert annotation_ref("fingerprint_documents") == "PERF.md ann. 12"
    assert annotation_ref("no_such_query") is None
