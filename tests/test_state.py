"""Watermark store unit tests — pure Python, no Spark.

Scenarios mirror the reference's watermark test suite (SURVEY §5:
tests/unit/test_simple_watermark_manager.py — default creation, cumulative
sums, blacklist dedup, session totals, reset preserve_files, locks)."""

import pytest

from s3_redshift_backup_tool_spark.state import (
    LocalJsonBackend, LockHeldError, WatermarkStore, WatermarkView,
    default_watermark)

SRC, TBL, TGT = "us_dw:settlement.orders", "orders", "redshift_default"


@pytest.fixture()
def store(tmp_path):
    return WatermarkStore(LocalJsonBackend(str(tmp_path)))


def test_default_creation(store):
    doc = store.get(SRC, TBL, TGT)
    assert doc["version"] == "2.0"
    assert doc["mysql_state"]["status"] == "pending"
    assert doc["mysql_state"]["total_rows"] == 0
    assert doc["processed_files"] == []
    # persisted on first get
    assert store.backend.get(store._key(SRC, TBL, TGT)) is not None


def test_cumulative_extraction_totals(store):
    store.update_extraction_state(SRC, TBL, TGT, last_id=100,
                                  session_rows=1000, session_files=2)
    store.update_extraction_state(SRC, TBL, TGT, last_id=250,
                                  session_rows=500, session_files=1)
    doc = store.get(SRC, TBL, TGT)
    ms = doc["mysql_state"]
    assert ms["total_rows"] == 1500          # cumulative
    assert ms["last_session_rows"] == 500    # overwritten
    assert ms["s3_files_created"] == 3
    assert ms["last_session_files"] == 1
    assert ms["last_id"] == 250


def test_blacklist_union_dedup(store):
    store.update_load_state(SRC, TBL, TGT, loaded_files=["s3://a", "s3://b"])
    store.update_load_state(SRC, TBL, TGT, loaded_files=["s3://b", "s3://c"])
    doc = store.get(SRC, TBL, TGT)
    assert sorted(doc["processed_files"]) == ["s3://a", "s3://b", "s3://c"]
    assert store.is_processed(SRC, TBL, TGT, "s3://b")
    assert not store.is_processed(SRC, TBL, TGT, "s3://zzz")


def test_target_count_external_only(store):
    # load-state update must NOT move target row counts (reference
    # update_redshift_count_from_external :251-277 is the only path)
    store.update_load_state(SRC, TBL, TGT, loaded_files=["s3://a"])
    assert store.get(SRC, TBL, TGT)["redshift_state"]["total_rows"] == 0
    store.update_target_count(SRC, TBL, TGT, 1234)
    doc = store.get(SRC, TBL, TGT)
    assert doc["redshift_state"]["total_rows"] == 1234
    assert doc["redshift_state"]["last_session_rows"] == 1234
    store.update_target_count(SRC, TBL, TGT, 1500)
    doc = store.get(SRC, TBL, TGT)
    assert doc["redshift_state"]["last_session_rows"] == 266


def test_manual_override_and_reset_preserve_files(store):
    store.update_load_state(SRC, TBL, TGT, loaded_files=["s3://a"])
    store.set_manual(SRC, TBL, TGT, last_timestamp="2026-01-01 00:00:00", last_id=42)
    doc = store.get(SRC, TBL, TGT)
    assert doc["metadata"]["manual_override"] is True
    assert doc["mysql_state"]["last_id"] == 42

    doc = store.reset(SRC, TBL, TGT, preserve_files=True)
    assert doc["mysql_state"]["last_id"] is None
    assert doc["processed_files"] == ["s3://a"]   # survived reset

    doc = store.reset(SRC, TBL, TGT, preserve_files=False)
    assert doc["processed_files"] == []


def test_large_blacklist(store):
    files = [f"s3://bucket/f{i:05d}.parquet" for i in range(2000)]
    store.update_load_state(SRC, TBL, TGT, loaded_files=files)
    assert len(store.processed_files(SRC, TBL, TGT)) == 2000
    assert store.is_processed(SRC, TBL, TGT, "s3://bucket/f01999.parquet")


def test_lock_exclusion(store):
    token = store.acquire_lock(SRC, TBL, TGT)
    with pytest.raises(LockHeldError):
        store.acquire_lock(SRC, TBL, TGT)
    assert not store.release_lock(SRC, TBL, TGT, "wrong-token")
    assert store.release_lock(SRC, TBL, TGT, token)
    store.acquire_lock(SRC, TBL, TGT)  # re-acquirable after release


@pytest.mark.filterwarnings("error::pytest.PytestUnhandledThreadExceptionWarning")
def test_lock_acquire_is_atomic(store):
    """Concurrent acquirers race through put_if_absent; exactly one wins
    and EVERY loser gets the contractual LockHeldError — never a
    JSONDecodeError from observing a partially-written lock payload
    (tmp + os.link makes the payload atomically visible)."""
    import threading

    results: list[str | None] = []
    errors: list[BaseException] = []

    def _try():
        try:
            results.append(store.acquire_lock(SRC, "race_tbl", TGT))
        except LockHeldError:
            results.append(None)
        except BaseException as e:  # noqa: BLE001 — the assertion target
            errors.append(e)

    threads = [threading.Thread(target=_try) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == [], f"losers must raise LockHeldError, got {errors!r}"
    winners = [r for r in results if r is not None]
    assert len(winners) == 1
    assert len(results) == 8  # every loser reported via LockHeldError


def test_summary_and_file_stats(store):
    store.update_extraction_state(SRC, TBL, TGT, last_timestamp="2024-01-01 00:00:00",
                                  last_id=42, session_rows=100, session_files=3)
    store.update_load_state(SRC, TBL, TGT, loaded_files=["/f/a", "/f/b"])
    store.update_target_count(SRC, TBL, TGT, 100)

    s = store.get_summary(SRC, TBL, TGT)
    assert s["mysql_total_rows"] == 100 and s["mysql_last_id"] == 42
    assert s["redshift_total_rows"] == 100
    assert s["total_processed_files"] == 2
    assert s["mysql_status"] == "success"

    fs = store.get_file_stats(SRC, TBL, TGT)
    assert fs["total_files"] == 2 and not fs["performance_warning"]
    assert fs["sample_files"] == ["/f/a", "/f/b"]

    split = store.get_files_by_status(SRC, TBL, TGT, ["/f/a", "/f/new"])
    assert split["processed_files"] == ["/f/a"]
    assert split["unprocessed_files"] == ["/f/new"]
    assert split["total_files"] == 2


def test_summary_manifest_mode_counts(store):
    """In manifest-table mode the doc array stays empty; summary falls
    back to the cumulative files_loaded_total metadata."""
    store.update_load_state(SRC, "m_tbl", TGT, n_files=7)
    store.update_load_state(SRC, "m_tbl", TGT, n_files=5)
    s = store.get_summary(SRC, "m_tbl", TGT)
    assert s["total_processed_files"] == 12
    assert store.get(SRC, "m_tbl", TGT)["processed_files"] == []


def test_legacy_adapter_view():
    v = WatermarkView(default_watermark())
    assert v.last_processed_id == 0
    assert v.mysql_status == "pending"
    assert v.processed_s3_files == []


def test_legacy_adapter_roundtrip(tmp_path):
    """v1-API calls land in the v2.0 doc with cumulative accounting."""
    from s3_redshift_backup_tool_spark.state import (
        LegacyWatermarkAdapter, LocalJsonBackend, WatermarkStore)

    store = WatermarkStore(LocalJsonBackend(str(tmp_path)))
    ad = LegacyWatermarkAdapter(store, "src", "tgt")

    assert ad.update_mysql_watermark(
        "t1", extraction_time="2024-01-01T00:00:00Z",
        max_data_timestamp="2024-01-01 00:00:00", last_processed_id=500,
        rows_extracted=1000, s3_file_count=4)
    assert ad.update_mysql_watermark(
        "t1", extraction_time="2024-01-02T00:00:00Z",
        max_data_timestamp="2024-01-02 00:00:00", last_processed_id=900,
        rows_extracted=250, s3_file_count=1)
    assert ad.update_redshift_watermark(
        "t1", load_time=None, rows_loaded=999999,  # ignored by design
        processed_files=["a.parquet", "b.parquet"])

    wm = ad.get_table_watermark("t1")
    assert wm.last_mysql_data_timestamp == "2024-01-02 00:00:00"
    assert wm.last_processed_id == 900
    assert wm.mysql_row_count == 1250          # cumulative
    assert wm.mysql_last_session_rows == 250   # session only
    assert wm.s3_file_count == 5
    assert wm.redshift_row_count == 0          # rows_loaded ignored
    assert set(wm.processed_s3_files) == {"a.parquet", "b.parquet"}
    assert wm.mysql_status == "success" and wm.redshift_status == "success"


def test_legacy_doc_import_migrates_v1_state(tmp_path):
    """A v1-shaped document migrates into the v2.0 store: totals carried
    verbatim, blacklist union-deduped, strategy preserved."""
    from s3_redshift_backup_tool_spark.state import (
        LegacyWatermarkAdapter, LocalJsonBackend, WatermarkStore)

    store = WatermarkStore(LocalJsonBackend(str(tmp_path)))
    ad = LegacyWatermarkAdapter(store, "src", "tgt")
    # pre-existing v2 state with one processed file
    store.update_load_state("src", "t2", "tgt", loaded_files=["old.parquet"])

    v1 = {
        "table_name": "t2",
        "last_mysql_data_timestamp": "2023-06-01 12:00:00",
        "last_processed_id": 42424242,
        "mysql_status": "success",
        "mysql_rows_extracted": 7_000_000,
        "s3_file_count": 70,
        "redshift_status": "success",
        "redshift_rows_loaded": 6_999_000,
        "processed_s3_files": ["old.parquet", "new1.parquet"],
        "backup_strategy": "timestamp_only",
    }
    ad.import_legacy_doc("t2", v1)

    wm = ad.get_table_watermark("t2")
    assert wm.last_mysql_data_timestamp == "2023-06-01 12:00:00"
    assert wm.last_processed_id == 42424242
    assert wm.mysql_row_count == 7_000_000      # verbatim, not re-added
    assert wm.redshift_row_count == 6_999_000
    assert wm.s3_file_count == 70
    assert wm.backup_strategy == "timestamp_only"
    assert set(wm.processed_s3_files) == {"old.parquet", "new1.parquet"}
    assert store.is_processed("src", "t2", "tgt", "new1.parquet")
    # resume works off the migrated cursor
    doc = store.get("src", "t2", "tgt")
    assert doc["metadata"]["migrated_from"] == "v1"
