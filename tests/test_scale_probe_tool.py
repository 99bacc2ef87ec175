"""Unit tests for tools/scale_probe.py's keep-cleaner accumulation —
the r11 defense against host-noise overwrites (one loaded sweep must
not replace a clean artifact; a CODE change must) — plus the r12
adjudication lint: the artifact may not carry UNEXPLAINED scale-killer
flags (every BroadcastNestedLoopJoin must be proven a scalar broadcast
or deliberately kept as a real flag, which fails here until fixed)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale_probe import _keep_cleaner  # noqa: E402


def test_artifact_has_no_unexplained_scale_killers():
    """r11 shipped 22 rows flagged scale_killers=[BNLJ] whose only
    instances were the benign 1-row threshold-broadcast idiom; the
    adjudicator (tools/scale_probe.py --adjudicate) proves the build
    sides scalar and clears the flag. This lint keeps the artifact
    honest: a NEW real killer (CartesianProduct, or a BNLJ whose build
    side is not a provable scalar) fails CI until the plan is fixed or
    the entry is explicitly removed."""
    acc = json.load(open(os.path.join(REPO, "scale_probe_results.json")))
    offenders = {name: row["scale_killers"]
                 for name, row in acc.items()
                 if row.get("scale_killers")}
    assert not offenders, (
        f"unadjudicated scale-killer flags in scale_probe_results.json: "
        f"{offenders} — run python tools/scale_probe.py --adjudicate, "
        "then fix any flag that survives (it is a real nested-loop "
        "risk, not the scalar-broadcast idiom)")


def test_adjudicated_rows_carry_bnlj_evidence():
    """A row whose flag was cleared must say WHY: bnlj_total ==
    bnlj_benign (every instance proven corpus-independent)."""
    acc = json.load(open(os.path.join(REPO, "scale_probe_results.json")))
    bad = {}
    for name, row in acc.items():
        ev = row.get("benign_broadcasts")
        if ev and ev["bnlj_total"] != ev["bnlj_benign"] \
                and not row.get("scale_killers"):
            bad[name] = ev
    assert not bad, (f"rows with unproven BNLJ instances but no flag: "
                     f"{bad}")


def _rec(sf01, sf1, killers=(), diff=None):
    return {"sf01_sec": sf01, "sf1_sec": sf1,
            "time_ratio": round(sf1 / sf01, 2),
            "plan_shape_identical": not diff,
            "scale_killers": list(killers),
            "plan_diff": diff or {}}


def test_noisier_rerun_does_not_overwrite():
    clean = _rec(1.0, 2.0)
    noisy = _rec(2.4, 8.9)
    assert _keep_cleaner(clean, noisy) is clean


def test_cleaner_rerun_wins():
    noisy = _rec(2.4, 8.9)
    clean = _rec(1.0, 2.0)
    assert _keep_cleaner(noisy, clean) is clean


def test_plan_shape_change_always_wins():
    """A slower record with a DIFFERENT plan reflects a code change and
    must replace the stale fast one."""
    old = _rec(1.0, 2.0)
    new = _rec(3.0, 9.0, diff={"Exchange": [1, 2]})
    assert _keep_cleaner(old, new) is new


def test_killer_change_always_wins():
    old = _rec(1.0, 2.0, killers=["BroadcastNestedLoopJoin"])
    new = _rec(3.0, 9.0)
    assert _keep_cleaner(old, new) is new


def test_headline_records_compare_on_total():
    old = {"sf01_sec": 1.786, "sf1_sec": 2.816, "rows": [6, 60]}
    new = {"sf01_sec": 2.446, "sf1_sec": 8.938, "rows": [6, 60]}
    assert _keep_cleaner(old, new) is old
    assert _keep_cleaner(new, old) is old


def test_format_migration_takes_new():
    """Old pre-plan-capture records always yield to the new format."""
    old = {"sf01_sec": 0.1, "sf1_sec": 0.1}
    new = _rec(5.0, 9.0)
    assert _keep_cleaner(old, new) is new


# ---------------------------------------------------------------------------
# the adjudicator's Catalyst-condition parser (pure Python — the lint
# above trusts these proofs, so the parser itself gets pinned)
# ---------------------------------------------------------------------------

from scale_probe import (_ISNOTNULL, _KEY_BOUND,  # noqa: E402
                         _split_conjuncts, _strip_outer_parens)


def test_strip_outer_parens():
    assert _strip_outer_parens("(a AND b)") == "a AND b"
    assert _strip_outer_parens("((a AND b))") == "a AND b"
    # the first '(' closes early: NOT an outer wrapper
    assert _strip_outer_parens("(a) AND (b)") == "(a) AND (b)"
    assert _strip_outer_parens("plain") == "plain"


def test_split_conjuncts_literal_key_shapes():
    cs = _split_conjuncts("(isnotnull(vec_id#6L) AND (vec_id#6L < 4))")
    assert cs == ["isnotnull(vec_id#6L)", "vec_id#6L < 4"]
    assert _ISNOTNULL.match(cs[0]) and _KEY_BOUND.match(cs[1])
    cs = _split_conjuncts("(isnotnull(vec_id#47L) AND (vec_id#47L < 50))")
    assert all(_ISNOTNULL.match(c) or _KEY_BOUND.match(c) for c in cs)


def test_key_bound_rejects_non_literal_shapes():
    # joins to another column, functions, string literals: NOT a
    # plan-time-fixed id set — must not match
    for bad in ("a#1 < b#2", "substr(a#1, 1, 3) = 5", "a#1 < x#9",
                "a#1 IN (1,2,3)", "a#1 >= 4", "a#1 < 4.5"):
        assert not _KEY_BOUND.match(bad), bad


def test_split_conjuncts_nested_and_inside_parens():
    # an AND nested inside parens is NOT a top-level conjunct boundary
    cs = _split_conjuncts("((a#1 < 3 AND b#2 = 5)) AND isnotnull(c#3)")
    assert cs == ["a#1 < 3 AND b#2 = 5", "isnotnull(c#3)"]
    assert not _KEY_BOUND.match(cs[0])     # compound conjunct: rejected


class _FakeCond:
    def __init__(self, s):
        self._s = s

    def toString(self):
        return self._s


class _FakeFilterNode:
    def __init__(self, cond):
        self._cond = _FakeCond(cond)

    def condition(self):
        return self._cond


def test_literal_key_filter_requires_unique_key_column():
    """ADVICE r12 (medium): `attr < k` bounds the build-side row count
    ONLY when attr is a unique key. A literal predicate on a non-unique
    column (label = 3) must NOT be classified benign — its match count
    grows with the corpus."""
    from scale_probe import _literal_key_filter
    ok = _FakeFilterNode("(isnotnull(vec_id#6L) AND (vec_id#6L < 4))")
    assert _literal_key_filter(ok)
    non_unique = _FakeFilterNode("(isnotnull(label#3L) AND (label#3L = 3))")
    assert not _literal_key_filter(non_unique)
    non_unique2 = _FakeFilterNode("(n_chars#9L < 100)")
    assert not _literal_key_filter(non_unique2)
    # two different attributes: not the single-key idiom
    two = _FakeFilterNode("((vec_id#6L < 4) AND (doc_id#7L < 9))")
    assert not _literal_key_filter(two)


def test_unique_key_allowlist_covers_engine_tables():
    from scale_probe import _UNIQUE_KEY_COLS
    for col in ("vec_id", "doc_id", "event_id", "o_orderkey", "c_custkey"):
        assert col in _UNIQUE_KEY_COLS
    for col in ("label", "n_chars", "user_id", "l_orderkey"):
        assert col not in _UNIQUE_KEY_COLS  # non-unique in their tables
