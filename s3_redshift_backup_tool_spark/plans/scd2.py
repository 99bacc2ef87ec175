"""Slowly-changing-dimension Type 2 maintenance from CDC deltas.

The reference replicates source tables verbatim (full/append/
incremental — src/core/s3_manager.py + gemini_redshift_loader.py);
history, when its users need it, is whatever the source kept. Type 2
versioning — every attribute change appends a validity-bounded row —
is the standard warehouse answer, and with CDC deltas already flowing
through the sync plan it can be MAINTAINED rather than reconstructed.

Two operators, pinned equivalent by test:

- :func:`scd2_from_log` — batch reconstruction: a (key, attr, ts) change
  log -> versioned dimension via window functions. One shuffle on the
  key; change-collapse, validity bounds and the current flag are all
  lag/lead over the per-key ordering. Fully SQL-expressible, so the
  registry query ``scd2_history_events`` carries a DuckDB oracle.
- :class:`SCD2Target` — incremental maintenance: each delta batch
  rewrites ONLY the touched keys' segments (stored CLOSED history for a
  touched key is immutable and re-attached untouched; the open segment
  is re-derived from (open row as log head) ∪ delta). Untouched keys
  never enter the job. State swap is the rename-aside crash-safe
  protocol shared with IncrementalRollup/streaming upsert.

Contract: per key, delta timestamps are >= the stored open segment's
``valid_from`` (CDC watermark ordering guarantees this); ties break on
the monotone ``seq_col``. At 100 TB the touched-key rewrite is the
point: a day's delta touches a sliver of the dimension, and the closed
history (the bulk) is never read or shuffled — only the open segments
(one row per live key) join the delta.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def scd2_from_log(df: DataFrame, key_col: str, attr_col: str,
                  ts_col: str, seq_col: str) -> DataFrame:
    """Change log -> Type 2 dimension.

    Consecutive rows with the same attribute collapse into one segment;
    ``valid_from`` = first ts of the segment, ``valid_to`` = next
    segment's start (NULL while current), ``is_current`` flags the open
    segment. ``seq_col`` breaks timestamp ties deterministically."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    changed = (df.withColumn("__prev", F.lag(attr_col).over(w))
                 .filter(F.col("__prev").isNull()
                         | (F.col(attr_col) != F.col("__prev"))))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    return (changed.select(
        key_col, attr_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull()))


class SCD2Target:
    """Parquet-backed Type 2 dimension maintained from CDC deltas."""

    def __init__(self, spark: SparkSession, state_path: str,
                 key_col: str, attr_col: str, ts_col: str, seq_col: str):
        self.spark = spark
        self.state_path = state_path
        self.key_col = key_col
        self.attr_col = attr_col
        self.ts_col = ts_col
        self.seq_col = seq_col

    def _exists(self) -> bool:
        return os.path.isdir(self.state_path)

    def _recover(self) -> None:
        """Same half-finished-swap repair as IncrementalRollup._recover."""
        base = self.state_path.rstrip("/")
        parent = os.path.dirname(base) or "."
        if not os.path.isdir(parent):
            return
        for entry in os.listdir(parent):
            full = os.path.join(parent, entry)
            if full.startswith(base + "__tmp"):
                shutil.rmtree(full, ignore_errors=True)
        old = base + "__old"
        if os.path.isdir(old):
            if self._exists():
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, self.state_path)

    def apply(self, delta: DataFrame) -> None:
        """Fold one CDC delta (key, attr, ts, seq) into the dimension."""
        self._recover()
        k, a, t, s = self.key_col, self.attr_col, self.ts_col, self.seq_col
        log = delta.select(k, a, t, s)
        if self._exists():
            stored = self.spark.read.parquet(self.state_path)
            keys = log.select(k).distinct()
            touched = stored.join(keys, k, "left_semi")
            untouched = stored.join(keys, k, "left_anti")
            # closed history of touched keys is immutable; the open
            # segment re-enters the log as its key's head entry (seq
            # below any real delta so the tie-break keeps it first)
            closed = touched.filter(~F.col("is_current"))
            opens = touched.filter("is_current")
            open_as_log = opens.select(
                F.col(k), F.col(a),
                F.col("valid_from").alias(t),
                F.lit(-1).cast("long").alias(s))
            # drop delta rows older than the open segment: they are
            # replays of history already closed (a re-delivered batch
            # must not re-open it) — makes apply() idempotent under
            # at-least-once delivery
            bound = opens.select(F.col(k), F.col("valid_from").alias("__vf"))
            log = (log.join(bound, k, "left")
                      .filter(F.col("__vf").isNull()
                              | (F.col(t) >= F.col("__vf")))
                      .drop("__vf"))
            rebuilt = scd2_from_log(open_as_log.unionByName(log), k, a, t, s)
            # a rebuilt first segment continues the open one: same attr,
            # same valid_from — so closed + rebuilt never overlap
            merged = untouched.unionByName(closed).unionByName(rebuilt)
        else:
            merged = scd2_from_log(log, k, a, t, s)
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
        return self.spark.read.parquet(self.state_path)


def dim_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view of a Type 2 dimension: the segment covering
    ``ts`` per key (``valid_from <= ts < valid_to``, open segments
    unbounded). A narrow filter — partition pruning applies if the
    dimension is stored partitioned on is_current; joining facts at
    THEIR event time is the as-of join in operators/temporal.py."""
    t = F.lit(ts)
    return dim.filter((F.col("valid_from") <= t)
                      & (F.col("valid_to").isNull()
                         | (F.col("valid_to") > t)))
