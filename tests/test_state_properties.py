"""Property-based tests (hypothesis) for the watermark state math —
the reference's subtlest logic (SURVEY §7.2): cumulative vs session
accounting, blacklist union-dedup, reset semantics. Pure Python, no
Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from s3_redshift_backup_tool_spark.state import (
    LocalJsonBackend, WatermarkStore)


def _store(tmp):
    return WatermarkStore(LocalJsonBackend(str(tmp)))


sessions = st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=1, max_size=20)


@settings(max_examples=30, deadline=None)
@given(rows=sessions)
def test_cumulative_total_is_sum_of_sessions(tmp_path_factory, rows):
    store = _store(tmp_path_factory.mktemp("st"))
    for r in rows:
        store.update_extraction_state("s", "t", "g", session_rows=r,
                                      session_files=0, status="success")
    doc = store.get("s", "t", "g")
    assert doc["mysql_state"]["total_rows"] == sum(rows)
    assert doc["mysql_state"]["last_session_rows"] == rows[-1]


file_batches = st.lists(
    st.lists(st.text(alphabet="abcdef0123456789/", min_size=1, max_size=20),
             max_size=10),
    min_size=1, max_size=10)


@settings(max_examples=30, deadline=None)
@given(batches=file_batches)
def test_blacklist_union_never_duplicates(tmp_path_factory, batches):
    store = _store(tmp_path_factory.mktemp("st"))
    expected: set[str] = set()
    for batch in batches:
        store.update_load_state("s", "t", "g", loaded_files=batch,
                                status="success")
        expected |= set(batch)
        files = store.get("s", "t", "g")["processed_files"]
        assert len(files) == len(set(files)), "blacklist grew duplicates"
        assert set(files) == expected
        for f in batch:
            assert store.is_processed("s", "t", "g", f)


@settings(max_examples=20, deadline=None)
@given(batches=file_batches, preserve=st.booleans())
def test_reset_preserve_files_keeps_exactly_blacklist(tmp_path_factory,
                                                      batches, preserve):
    store = _store(tmp_path_factory.mktemp("st"))
    all_files: set[str] = set()
    for batch in batches:
        store.update_load_state("s", "t", "g", loaded_files=batch,
                                status="success")
        all_files |= set(batch)
    store.update_extraction_state("s", "t", "g", session_rows=5,
                                  session_files=1, status="success")
    doc = store.reset("s", "t", "g", preserve_files=preserve)
    assert doc["mysql_state"]["total_rows"] == 0
    assert doc["mysql_state"]["status"] == "pending"
    assert set(doc["processed_files"]) == (all_files if preserve else set())


@settings(max_examples=30, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**12),
                    min_size=1, max_size=20))
def test_manual_override_always_wins_last(tmp_path_factory, ids):
    store = _store(tmp_path_factory.mktemp("st"))
    for i in ids:
        store.set_manual("s", "t", "g", last_id=i)
    doc = store.get("s", "t", "g")
    assert doc["mysql_state"]["last_id"] == ids[-1]
    assert doc["metadata"]["manual_override"] is True
