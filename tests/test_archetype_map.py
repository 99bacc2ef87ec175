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
