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

#: partial-state columns maintained per group
_PARTIALS = ("sum_value", "n_rows", "min_value", "max_value")


def _partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.sum(v).alias("sum_value"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"))


def _merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    return (a.unionByName(b)
             .groupBy(*keys)
             .agg(F.sum("sum_value").alias("sum_value"),
                  F.sum("n_rows").alias("n_rows"),
                  F.min("min_value").alias("min_value"),
                  F.max("max_value").alias("max_value")))


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

    def apply(self, delta: DataFrame) -> None:
        self._recover()
        part = _partials(delta, self.keys, self.value_col)
        if self._exists():
            cur = self.spark.read.parquet(self.state_path)
            merged = _merge(cur, part, self.keys)
        else:
            merged = part
        tmp = self.state_path.rstrip("/") + "__tmp" + uuid.uuid4().hex[:6]
        merged.write.mode("overwrite").parquet(tmp)
        old = self.state_path.rstrip("/") + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if self._exists():
            os.rename(self.state_path, old)
        os.rename(tmp, self.state_path)
        shutil.rmtree(old, ignore_errors=True)

    def read(self) -> DataFrame:
        self._recover()
        df = self.spark.read.parquet(self.state_path)
        return df.select(
            *self.keys, "n_rows", "sum_value", "min_value", "max_value",
            (F.col("sum_value") / F.col("n_rows")).alias("avg_value"))
