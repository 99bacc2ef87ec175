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
designed successor to this API. The migration is implemented here as
``RunningTotalsProcessor`` / ``FirstSeenProcessor`` behind a
capability gate: the runtime path requires the ``protobuf`` package
(verified: the streaming runner crashes on ``google.protobuf`` import
without it), so ``engine="auto"`` picks transformWithState only when
:func:`transform_with_state_available` reports the full runtime, and
falls back to ``applyInPandasWithState`` otherwise — both paths share
the same per-batch update logic, pinned equivalent by tests that
drive the processor classes directly.
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


def transform_with_state_available() -> bool:
    """True when the Spark-4 ``transformWithStateInPandas`` runtime is
    fully present: the API class ships with pyspark 4.x, but the
    worker-side state client additionally needs ``google.protobuf``
    (absent in this container — streams crash at first micro-batch
    without it). This probe gates ``engine="auto"``."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor)
    except ImportError:
        return False
    return True


def _resolve_engine(engine: str) -> str:
    if engine == "auto":
        return ("transformWithState" if transform_with_state_available()
                else "applyInPandasWithState")
    if engine not in ("transformWithState", "applyInPandasWithState"):
        raise ValueError(f"unknown stateful engine {engine!r}")
    return engine


def _fold_totals(n: int, s: float, pdfs: Iterable[pd.DataFrame],
                 user_id) -> pd.DataFrame:
    """Shared per-batch update for running totals — the single source of
    truth both stateful APIs execute, so path equivalence is structural,
    not coincidental."""
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    return pd.DataFrame({"user_id": [user_id], "n_events": [n],
                         "sum_value": [s]})


def _update_running_totals(key, pdfs: Iterable[pd.DataFrame],
                           state: GroupState):
    n, s = state.get if state.exists else (0, 0.0)
    out = _fold_totals(n, s, pdfs, key[0])
    state.update((int(out["n_events"][0]), float(out["sum_value"][0])))
    yield out


def _make_running_totals_processor():
    """Deferred class construction: the StatefulProcessor base imports
    cleanly on pyspark 4.x even without protobuf, but keeping it out of
    module import scope lets the legacy path run on builds without the
    module at all."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningTotalsProcessor(StatefulProcessor):
        """transformWithState twin of ``_update_running_totals``
        (typed ValueState instead of the flat state tuple)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            out = _fold_totals(n, s, rows, key[0])
            self._state.update((int(out["n_events"][0]),
                                float(out["sum_value"][0])))
            yield out

        def close(self) -> None:
            pass

    return RunningTotalsProcessor


def running_totals_per_user(events: DataFrame,
                            user_col: str = "user_id",
                            value_col: str = "value",
                            engine: str = "auto") -> DataFrame:
    """Cumulative (count, sum) per user across micro-batches — state the
    built-in aggs can't carry between triggers in update mode. Emits one
    row per key per batch with the running totals.

    ``engine``: ``auto`` (transformWithState when its runtime is fully
    present, else applyInPandasWithState), or either name explicitly."""
    sel = events.select(user_col, events[value_col].cast("double").alias("value"))
    grouped = sel.groupBy(user_col)
    if _resolve_engine(engine) == "transformWithState":
        return grouped.transformWithStateInPandas(
            _make_running_totals_processor()(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None")
    return grouped.applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


SEEN_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("is_new", T.BooleanType(), False),
    T.StructField("occurrences", T.LongType(), False),
])

_SEEN_STATE = T.StructType([
    T.StructField("count", T.LongType(), False),
])


def _fold_seen(count: int, is_new: bool, pdfs: Iterable[pd.DataFrame],
               key) -> pd.DataFrame:
    """Shared per-batch update for the first-seen ledger (both APIs)."""
    count += sum(len(p) for p in pdfs)
    return pd.DataFrame({"key": [key], "is_new": [is_new],
                         "occurrences": [count]})


def _update_first_seen(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    # applyInPandasWithState exposes no batch id, so "when first seen" is
    # reported as a flag on the first-arrival batch (is_new), not a batch
    # number the function cannot know.
    is_new = not state.exists
    (count,) = state.get if state.exists else (0,)
    out = _fold_seen(count, is_new, pdfs, key[0])
    state.update((int(out["occurrences"][0]),))
    yield out


def _make_first_seen_ttl(ttl_ms: int):
    """TTL-evicting variant: every update re-arms a processing-time
    timeout; a key quiet for ``ttl_ms`` is removed from the state store
    (it would report is_new=True if it ever returns — the standard
    bounded-memory dedup contract: exact within the TTL horizon)."""

    def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # eviction callback: no input rows for this key, just drop
            state.remove()
            return
        is_new = not state.exists
        (count,) = state.get if state.exists else (0,)
        out = _fold_seen(count, is_new, pdfs, key[0])
        state.update((int(out["occurrences"][0]),))
        state.setTimeoutDuration(ttl_ms)
        yield out

    return _update


def _make_first_seen_ttl_processor(ttl_ms: int):
    """transformWithState twin of ``_make_first_seen_ttl``: every update
    re-arms a processing-time TIMER ``ttl_ms`` ahead (delete-then-
    register — transformWithState timers don't auto-replace the way
    ``setTimeoutDuration`` does); when the timer fires the key's state
    is cleared, so a returning key reports first-seen again with a
    reset count — the same bounded-memory contract, exact within the
    TTL horizon."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class FirstSeenTtlProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("seen", _SEEN_STATE)

        def handleInputRows(self, key, rows, timerValues):
            is_new = not self._state.exists()
            (count,) = self._state.get() if self._state.exists() else (0,)
            out = _fold_seen(count, is_new, rows, key[0])
            self._state.update((int(out["occurrences"][0]),))
            for t in self._handle.listTimers():   # re-arm, don't stack
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + ttl_ms)
            yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # eviction: drop the ledger entry; nothing emitted
            self._state.clear()
            return iter([])

        def close(self) -> None:
            pass

    return FirstSeenTtlProcessor


def _make_first_seen_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class FirstSeenProcessor(StatefulProcessor):
        """transformWithState twin of ``_update_first_seen``."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("seen", _SEEN_STATE)

        def handleInputRows(self, key, rows, timerValues):
            is_new = not self._state.exists()
            (count,) = self._state.get() if self._state.exists() else (0,)
            out = _fold_seen(count, is_new, rows, key[0])
            self._state.update((int(out["occurrences"][0]),))
            yield out

        def close(self) -> None:
            pass

    return FirstSeenProcessor


def streaming_first_seen(df: DataFrame, key_col: str,
                         engine: str = "auto",
                         ttl_minutes: float | None = None) -> DataFrame:
    """Streaming exact dedup ledger: per key, when it was first seen and
    how many times since — the stateful form of exact_dedup for infinite
    streams (state = one small row per distinct key).

    ``ttl_minutes`` bounds state on infinite streams: a key quiet that
    long is evicted (processing-time timeout on the
    applyInPandasWithState engine; a processing-time TIMER on the
    transformWithState engine) and would report is_new=True on return —
    exact dedup within the TTL horizon, the 100 TB-stream default
    (unbounded NoTimeout state is only safe when the key universe is
    known-bounded).

    Operational caveat (tested): with ProcessingTimeTimeout the
    trigger loop stays alive to fire future evictions, so even an
    ``availableNow`` run never self-terminates and
    ``processAllAvailable()`` blocks — TTL streams are for continuous
    triggers; batch-style drains should poll the sink and stop()."""
    grouped = df.select(df[key_col].cast("string").alias("key")).groupBy("key")
    resolved = _resolve_engine(engine)
    if ttl_minutes is not None:
        if ttl_minutes <= 0:
            raise ValueError(
                f"ttl_minutes must be > 0, got {ttl_minutes} (a "
                "worker-side setTimeoutDuration(0) would only fail "
                "after the stream is already running)")
        if resolved == "transformWithState":
            return grouped.transformWithStateInPandas(
                _make_first_seen_ttl_processor(
                    int(ttl_minutes * 60_000))(),
                outputStructType=SEEN_SCHEMA,
                outputMode="Update",
                timeMode="ProcessingTime")
        return grouped.applyInPandasWithState(
            _make_first_seen_ttl(int(ttl_minutes * 60_000)),
            outputStructType=SEEN_SCHEMA,
            stateStructType=_SEEN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
    if resolved == "transformWithState":
        return grouped.transformWithStateInPandas(
            _make_first_seen_processor()(),
            outputStructType=SEEN_SCHEMA,
            outputMode="Update",
            timeMode="None")
    return grouped.applyInPandasWithState(
        _update_first_seen,
        outputStructType=SEEN_SCHEMA,
        stateStructType=_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
