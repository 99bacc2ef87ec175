"""Incremental aggregate maintenance: materialized rollups from CDC deltas.

The reference's consumers query raw synced tables in Redshift; any rollup
is recomputed from scratch. With CDC deltas already flowing through the
sync plan, the rollup can be maintained INCREMENTALLY: aggregate only the
new delta into partial states and merge them with the stored partials —
the classic materialized-view maintenance trick for distributive/
algebraic aggregates (sum/count/min/max + anything derivable: avg =
sum/count).

Scale shape: per increment, one partial aggregation over the DELTA (tiny
relative to the table) + one merge groupBy over (stored partials ∪ delta
partials). Stored state is one row per group — at 100 TB of facts the
state is MBs. The full-table recompute this replaces re-reads everything.

Correctness contract (tested): after any sequence of deltas, the stored
rollup equals the from-scratch aggregate of the union of those deltas —
provided each row is delivered exactly once (the sync plan's manifest /
checkpoint guarantees exactly that).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental_agg import (agg_state, finalize_agg,
                                         merge_agg_states,
                                         retract_agg_states)

#: state decimal scale: 1e-12 per-row rounding — full-precision-double
#: fidelity at test tolerances while keeping the ⊕-monoid bit-exact
#: (money-grade feeds can drop to the module default of 4)
_SCALE = 12


class IncrementalRollup:
    """Parquet-backed incremental rollup over (keys, value_col).

    ``apply(delta)`` folds one CDC delta into the stored state;
    ``read()`` returns the current rollup with derived columns
    (avg = sum/n). The state swap is rename-aside crash-safe like the
    streaming upsert (streaming/incremental.py)."""

    def __init__(self, spark: SparkSession, state_path: str,
                 keys: list[str], value_col: str):
        self.spark = spark
        self.state_path = state_path
        self.keys = list(keys)
        self.value_col = value_col

    def _exists(self) -> bool:
        return os.path.isdir(self.state_path)

    def _recover(self) -> None:
        """Repair a half-finished swap (same contract as the streaming
        upsert's _recover_swap): a crash between the two renames leaves
        the previous state at ``__old`` — restore it rather than
        silently restarting the rollup from empty, which would
        permanently under-count every group. Stale ``__tmp*`` writes are
        discarded (their delta is re-applied by the caller's retry)."""
        base = self.state_path.rstrip("/")
        if not os.path.isdir(os.path.dirname(base) or "."):
            # nothing to recover: the first apply() with a nested state
            # path runs before Spark has created the parent directory
            return
        for entry in os.listdir(os.path.dirname(base) or "."):
            full = os.path.join(os.path.dirname(base) or ".", entry)
            if full.startswith(base + "__tmp"):
                shutil.rmtree(full, ignore_errors=True)
        old = base + "__old"
        if os.path.isdir(old):
            if self._exists():
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, self.state_path)

    def _load_state(self) -> DataFrame:
        """Read stored state, refusing a legacy-format directory with a
        clear message instead of a downstream unresolved-column
        AnalysisException. The pre-v2 state persisted finalized columns
        (``sum_value/n_rows/min_value/max_value``) which lack the
        sum-of-squares partial, so stddev cannot be reconstructed —
        migration is impossible and a rebuild is the honest answer."""
        state = self.spark.read.parquet(self.state_path)
        v = self.value_col
        want = {f"{v}__n", f"{v}__sum", f"{v}__min", f"{v}__max",
                f"{v}__ssq"}
        if not want.issubset(set(state.columns)):
            legacy = {"n_rows", "sum_value", "min_value", "max_value"}
            if legacy.issubset(set(state.columns)):
                raise ValueError(
                    f"rollup state at {self.state_path} uses the legacy "
                    "v1 finalized-column format; the v2 engine keeps "
                    "mergeable partials (incl. sum-of-squares) that v1 "
                    "never stored — rebuild required: delete the state "
                    "directory and re-apply the deltas")
            raise ValueError(
                f"rollup state at {self.state_path} is missing partial "
                f"columns {sorted(want - set(state.columns))} for "
                f"measure {v!r} — wrong state dir or measure name?")
        return state

    def _swap_in(self, merged: DataFrame) -> None:
        tmp = self.state_path.rstrip("/") + "__tmp" + uuid.uuid4().hex[:6]
        merged.write.mode("overwrite").parquet(tmp)
        old = self.state_path.rstrip("/") + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if self._exists():
            os.rename(self.state_path, old)
        os.rename(tmp, self.state_path)
        shutil.rmtree(old, ignore_errors=True)

    def apply(self, delta: DataFrame) -> None:
        """Fold one INSERT delta into the stored state (⊕)."""
        self._recover()
        part = agg_state(delta, self.keys, [self.value_col],
                         sum_scale=_SCALE)
        if self._exists():
            cur = self._load_state()
            merged = merge_agg_states(self.keys, [self.value_col],
                                      cur, part, sum_scale=_SCALE)
        else:
            merged = part
        self._swap_in(merged)

    def apply_deletes(self, deletes: DataFrame) -> None:
        """Retract a DELETE batch from the stored state (⊖): count/sum/
        avg/stddev stay exact; min/max on touched groups become NULL
        (honest recompute-to-know markers, not stale values); groups
        emptied by the deletes disappear. ``deletes`` must contain rows
        previously applied — the standard CDC delete-batch contract the
        sync plan's manifest guarantees."""
        self._recover()
        if not self._exists():
            raise ValueError("cannot retract from an empty rollup state")
        part = agg_state(deletes, self.keys, [self.value_col],
                         sum_scale=_SCALE)
        cur = self._load_state()
        left = retract_agg_states(self.keys, [self.value_col], cur, part,
                                  sum_scale=_SCALE)
        self._swap_in(left)

    def read(self) -> DataFrame:
        self._recover()
        state = self._load_state()
        fin = finalize_agg(state, self.keys, [self.value_col],
                           round_dp=None)
        v = self.value_col
        return fin.select(
            *self.keys,
            F.col(f"{v}_count").alias("n_rows"),
            F.col(f"{v}_sum").alias("sum_value"),
            F.col(f"{v}_min").alias("min_value"),
            F.col(f"{v}_max").alias("max_value"),
            F.col(f"{v}_avg").alias("avg_value"),
            F.col(f"{v}_stddev").alias("stddev_value"))
