"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful streaming at all (SURVEY §2.12) — its
watermark is a progress cursor. These are the capability extension for
event streams: arbitrary per-key state kept in Spark's state store,
Arrow-batched to Python.

Scale notes: state lives in the executor state store keyed by the
groupBy key, so memory is bounded by (keys x state size) per partition;
the GroupStateTimeout eviction keeps abandoned keys from accumulating
forever. Use built-in windowed aggs when they fit — this is for logic
they can't express (running de-dup, custom counters, session carry-over).

API note: Spark 4's ``transformWithStateInPandas`` (StatefulProcessor
with typed Value/List/Map state + timers, RocksDB-backed) is the
designed successor to this API; it requires the ``protobuf`` package,
which this container lacks (verified: the streaming runner crashes on
``google.protobuf`` import), so these operators stay on
``applyInPandasWithState`` — semantically equivalent for everything
built here, and the migration is mechanical (state schema + timer
declarations move into a StatefulProcessor class).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("sum_value", T.DoubleType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("s", T.DoubleType(), True),
])


def _update_running_totals(key, pdfs: Iterable[pd.DataFrame],
                           state: GroupState):
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [s]})


def running_totals_per_user(events: DataFrame,
                            user_col: str = "user_id",
                            value_col: str = "value") -> DataFrame:
    """Cumulative (count, sum) per user across micro-batches — state the
    built-in aggs can't carry between triggers in update mode. Emits one
    row per key per batch with the running totals."""
    sel = events.select(user_col, events[value_col].cast("double").alias("value"))
    return (sel.groupBy(user_col)
               .applyInPandasWithState(
                   _update_running_totals,
                   outputStructType=RUNNING_TOTALS_SCHEMA,
                   stateStructType=_STATE_SCHEMA,
                   outputMode="update",
                   timeoutConf=GroupStateTimeout.NoTimeout))


SEEN_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("is_new", T.BooleanType(), False),
    T.StructField("occurrences", T.LongType(), False),
])

_SEEN_STATE = T.StructType([
    T.StructField("count", T.LongType(), False),
])


def _update_first_seen(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    # applyInPandasWithState exposes no batch id, so "when first seen" is
    # reported as a flag on the first-arrival batch (is_new), not a batch
    # number the function cannot know.
    is_new = not state.exists
    (count,) = state.get if state.exists else (0,)
    count += sum(len(p) for p in pdfs)
    state.update((count,))
    yield pd.DataFrame({"key": [key[0]], "is_new": [is_new],
                        "occurrences": [count]})


def streaming_first_seen(df: DataFrame, key_col: str) -> DataFrame:
    """Streaming exact dedup ledger: per key, when it was first seen and
    how many times since — the stateful form of exact_dedup for infinite
    streams (state = one small row per distinct key)."""
    return (df.select(df[key_col].cast("string").alias("key"))
              .groupBy("key")
              .applyInPandasWithState(
                  _update_first_seen,
                  outputStructType=SEEN_SCHEMA,
                  stateStructType=_SEEN_STATE,
                  outputMode="update",
                  timeoutConf=GroupStateTimeout.NoTimeout))
