"""Completion markers: the orchestration handshake surface.

The reference publishes per-table and per-pipeline completion markers to
S3 for Airflow sensors to poll (src/cli/airflow_integration.py:154-218:
key ``{prefix}/{YYYYMMDD}/sync_{table}_{STATUS}``, a small JSON body;
src/cli/completion_marker_utils.py replays them from sync metadata).
The STATUS lives in the key itself so a sensor is a pure existence
check — no read, no parse.

Same contract here over a directory (stands in for the bucket, like
LocalJsonBackend does for the watermark store): one marker file per
(date, table, status), written atomically (tmp + rename) and
idempotently (first writer wins — re-running a DAG day must not bump
completion_time and retrigger downstream freshness logic). Markers are
orchestration glue, not data: rows never flow through them, so plain
driver-side JSON is the right tool (the run *log* — append_run_log — is
the queryable parquet half of ops history).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


def _clean(name: str) -> str:
    return name.replace(".", "_").replace(":", "_")


class CompletionMarkers:
    """Marker registry rooted at ``<root>/<YYYYMMDD>/``."""

    def __init__(self, root: str):
        self.root = root

    def _key(self, kind: str, name: str, status: str,
             date_str: str | None = None) -> str:
        date_str = date_str or _utcnow().strftime("%Y%m%d")
        return os.path.join(self.root, date_str,
                            f"{kind}_{_clean(name)}_{status.upper()}")

    def _write(self, path: str, body: dict) -> bool:
        """Atomic, idempotent create. Returns False when the marker
        already exists (the first run of the day owns it)."""
        if os.path.exists(path):
            return False
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(body, f, indent=2)
        try:
            # link(2) fails with EEXIST if the marker is already there, so
            # a concurrent creator losing the race leaves the winner's
            # marker untouched (same primitive as the watermark lock)
            os.link(tmp, path)
            return True
        except OSError:
            return False
        finally:
            os.unlink(tmp)

    def write_table_marker(self, table: str, status: str, execution_id: str,
                           date_str: str | None = None) -> bool:
        """Reference create_table_marker (airflow_integration.py:154-188)."""
        return self._write(
            self._key("sync", table, status, date_str),
            {"table": table, "status": status, "execution_id": execution_id,
             "completion_time": _utcnow().isoformat(),
             "marker_created_by": "s3_redshift_backup_tool_spark"})

    def write_pipeline_marker(self, pipeline: str, tables: list[str],
                              overall_status: str, execution_id: str,
                              date_str: str | None = None) -> bool:
        """Reference create_pipeline_marker (airflow_integration.py:190-218)."""
        return self._write(
            self._key("pipeline", pipeline, overall_status, date_str),
            {"pipeline": pipeline, "tables": sorted(tables),
             "status": overall_status, "execution_id": execution_id,
             "completion_time": _utcnow().isoformat(),
             "tables_count": len(tables)})

    def check(self, table: str, status: str = "SUCCESS",
              date_str: str | None = None, kind: str = "sync") -> bool:
        """The Airflow-sensor half: pure existence check."""
        return os.path.exists(self._key(kind, table, status, date_str))

    def read(self, table: str, status: str = "SUCCESS",
             date_str: str | None = None, kind: str = "sync") -> dict | None:
        path = self._key(kind, table, status, date_str)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def list_markers(self, date_str: str | None = None) -> list[str]:
        """Relative marker keys, newest date first."""
        if not os.path.isdir(self.root):
            return []
        dates = [date_str] if date_str else sorted(os.listdir(self.root),
                                                   reverse=True)
        out = []
        for d in dates:
            day = os.path.join(self.root, d)
            if os.path.isdir(day):
                out.extend(f"{d}/{m}" for m in sorted(os.listdir(day))
                           if not m.endswith(".tmp"))
        return out


def publish_run_markers(work_dir: str, pipeline_name: str,
                        results: dict) -> dict[str, bool]:
    """Publish per-table + pipeline markers for a finished sync run.
    ``results`` is sync_pipeline's {table: SyncResult}; a table is
    SUCCESS when its A7 verification held. Returns {marker_name:
    created} for the caller's JSON output."""
    import uuid

    markers = CompletionMarkers(os.path.join(work_dir, "_completion_markers"))
    execution_id = uuid.uuid4().hex[:12]
    out = {}
    for table, r in results.items():
        status = "SUCCESS" if r.verified else "FAILED"
        out[f"sync_{table}_{status}"] = markers.write_table_marker(
            table, status, execution_id)
    overall = "SUCCESS" if all(r.verified for r in results.values()) else "FAILED"
    out[f"pipeline_{pipeline_name}_{overall}"] = markers.write_pipeline_marker(
        pipeline_name, list(results), overall, execution_id)
    return out
