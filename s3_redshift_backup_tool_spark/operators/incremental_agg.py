"""Incremental materialized-aggregate maintenance: delta-merge agg states.

The reference syncs raw deltas and recomputes downstream aggregates from
scratch every run (src/core/s3_manager.py staging + warehouse reload; its
"verify" pass re-counts the whole table). At 100 TB a nightly full
recompute of a grouped aggregate is the single most expensive query in the
warehouse. This module maintains the aggregate INCREMENTALLY instead:

- :func:`agg_state` reduces a relation to a per-key mergeable state
  (count, decimal-exact sum, min, max, decimal-exact sum-of-squares) —
  one map-side-combinable pass;
- :func:`merge_agg_states` ⊕-combines any number of states (full-outer
  coalesce-add) — the stored corpus state plus each CDC delta batch;
- :func:`retract_agg_states` ⊖-subtracts a deletion batch's state from a
  stored state for the retractable measures (count/sum/sumsq and the avg
  and stddev derived from them); min/max are NOT retractable without a
  rescan, so the subtracted state drops them rather than lying;
- :func:`finalize_agg` derives avg/stddev from the state.

Algebra: states form a commutative monoid under ⊕, so
``finalize(state(A) ⊕ state(B)) == finalize(state(A ∪ B))`` exactly —
sums are carried as DECIMAL(38, sum_scale) (squares at scale 6) so the
equality is bit-exact regardless of partitioning or merge order (double
sums would drift in the last ulp). At 100 TB: each delta batch touches only its own keys; the
merge is a join on the (much smaller) key space, never a fact-table scan.

Scale note: merge shuffles |keys| rows, not |rows|. State width is five
numerics per measure; a billion-key state is a few tens of GB — a normal
shuffle, and the stored state can be bucketed by key so repeated merges
are co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Decimal widths. Default sum scale 4 suits money-grade data (sum of
# 15-digit inputs over 10^12 rows fits well inside 38-4 integer digits);
# raise ``sum_scale`` for full-precision doubles (e.g. 12 -> per-row
# rounding 5e-13). The ssq scale is pinned at 6 because Spark's
# precision-loss rule forces decimal products to scale >= 6 anyway; the
# per-row rounding is deterministic, so merge order still cannot drift
# at ANY scale — scale only affects fidelity to the raw-double
# aggregate, never the ⊕-monoid laws.
_DEFAULT_SUM_SCALE = 4
_SSQ_T = "decimal(38,6)"


def _sum_t(scale: int = _DEFAULT_SUM_SCALE) -> str:
    return f"decimal(38,{scale})"


def agg_state(df: DataFrame, keys: list[str], measures: list[str],
              sum_scale: int = _DEFAULT_SUM_SCALE) -> DataFrame:
    """One partial-aggregable pass -> per-key mergeable state.

    For each measure column m emits ``m__n, m__sum, m__min, m__max,
    m__ssq`` (decimal-exact sum / sum-of-squares, so downstream merges
    commute bit-exactly)."""
    aggs = []
    st = _sum_t(sum_scale)
    for m in measures:
        c = F.col(m)
        d = c.cast(st)
        aggs += [
            F.count(c).alias(f"{m}__n"),
            F.sum(d).cast(st).alias(f"{m}__sum"),
            F.min(c).alias(f"{m}__min"),
            F.max(c).alias(f"{m}__max"),
            F.sum((d * d).cast(_SSQ_T)).cast(_SSQ_T).alias(f"{m}__ssq"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(keys: list[str], measures: list[str],
                     *states: DataFrame,
                     sum_scale: int = _DEFAULT_SUM_SCALE) -> DataFrame:
    """⊕-combine states: full-outer join on keys, coalesce-add measures.

    Associative and commutative: chain deltas in any order. For repeated
    nightly merges, persist the stored state bucketed by ``keys`` so this
    join is co-partitioned (zero extra shuffle on the big side)."""
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    out = states[0]
    for nxt in states[1:]:
        # Both states usually derive from the SAME source relation, so
        # attribute references are ambiguous in a self-join; rename the
        # right side's columns instead of relying on dataset aliases.
        b = nxt.select([F.col(c).alias(f"__b_{c}") for c in nxt.columns])
        cond = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in keys]
        j = out.join(b, cond, "full_outer")
        sel = [F.coalesce(F.col(k), F.col(f"__b_{k}")).alias(k)
               for k in keys]
        for m in measures:
            av = {s: F.col(f"{m}__{s}") for s in ("n", "sum", "min", "max", "ssq")}
            bv = {s: F.col(f"__b_{m}__{s}") for s in ("n", "sum", "min", "max", "ssq")}
            zero = F.lit(0).cast(_sum_t(sum_scale))
            zssq = F.lit(0).cast(_SSQ_T)
            sel += [
                (F.coalesce(av["n"], F.lit(0)) + F.coalesce(bv["n"], F.lit(0))
                 ).alias(f"{m}__n"),
                (F.coalesce(av["sum"], zero) + F.coalesce(bv["sum"], zero)
                 ).cast(_sum_t(sum_scale)).alias(f"{m}__sum"),
                F.least(av["min"], bv["min"]).alias(f"{m}__min"),
                F.greatest(av["max"], bv["max"]).alias(f"{m}__max"),
                (F.coalesce(av["ssq"], zssq) + F.coalesce(bv["ssq"], zssq)
                 ).cast(_SSQ_T).alias(f"{m}__ssq"),
            ]
        out = j.select(*sel)
    return out


def retract_agg_states(keys: list[str], measures: list[str],
                       stored: DataFrame, deleted: DataFrame,
                       sum_scale: int = _DEFAULT_SUM_SCALE) -> DataFrame:
    """⊖-subtract a deletion batch's state from the stored state.

    Only count/sum/ssq (and thus avg/stddev) are retractable; min/max
    would need a rescan of surviving rows, so the result carries NULL
    there — an honest "recompute to know" marker, not a stale value.
    Keys whose count reaches zero are dropped (the group no longer
    exists). ``deleted`` must be a state over rows that ARE in stored
    (standard CDC delete-batch contract)."""
    b = deleted.select([F.col(c).alias(f"__b_{c}") for c in deleted.columns])
    cond = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in keys]
    j = stored.join(b, cond, "left_outer")
    sel = [F.col(k).alias(k) for k in keys]
    for m in measures:
        zero = F.lit(0).cast(_sum_t(sum_scale))
        zssq = F.lit(0).cast(_SSQ_T)
        bn = F.col(f"__b_{m}__n")
        sel += [
            (F.col(f"{m}__n") - F.coalesce(bn, F.lit(0))).alias(f"{m}__n"),
            (F.col(f"{m}__sum") - F.coalesce(F.col(f"__b_{m}__sum"), zero)
             ).cast(_sum_t(sum_scale)).alias(f"{m}__sum"),
            F.when(bn.isNull(), F.col(f"{m}__min")).alias(f"{m}__min"),
            F.when(bn.isNull(), F.col(f"{m}__max")).alias(f"{m}__max"),
            (F.col(f"{m}__ssq") - F.coalesce(F.col(f"__b_{m}__ssq"), zssq)
             ).cast(_SSQ_T).alias(f"{m}__ssq"),
        ]
    first = measures[0]
    return j.select(*sel).where(F.col(f"{first}__n") > 0)


def finalize_agg(state: DataFrame, keys: list[str],
                 measures: list[str],
                 round_dp: int | None = 6) -> DataFrame:
    """Derive the user-facing aggregate from a state.

    avg = sum/n (exact decimal division then double); sample stddev via
    the sufficient statistics: (ssq - sum^2/n)/(n-1), computed in double
    from the decimal-exact inputs so both engines evaluate the identical
    IEEE expression — rounded to ``round_dp`` like every non-exact stat
    in the registry (``round_dp=None`` skips rounding for callers that
    want raw doubles, e.g. the rollup plan's legacy read surface)."""

    def _r(c):
        return c if round_dp is None else F.round(c, round_dp)
    sel = [F.col(k) for k in keys]
    for m in measures:
        n = F.col(f"{m}__n").cast("double")
        s = F.col(f"{m}__sum").cast("double")
        ssq = F.col(f"{m}__ssq").cast("double")
        var = (ssq - s * s / n) / (n - F.lit(1.0))
        # the n>1 gate wraps the WHOLE expression: greatest() skips NULLs
        # in Spark, so greatest(NULL, 0.0) would turn "undefined" into 0.0
        std = F.when(F.col(f"{m}__n") > 1,
                     _r(F.sqrt(F.greatest(var, F.lit(0.0)))))
        sel += [
            F.col(f"{m}__n").alias(f"{m}_count"),
            F.col(f"{m}__sum").cast("double").alias(f"{m}_sum"),
            _r(s / n).alias(f"{m}_avg"),
            F.col(f"{m}__min").cast("double").alias(f"{m}_min"),
            F.col(f"{m}__max").cast("double").alias(f"{m}_max"),
            std.alias(f"{m}_stddev"),
        ]
    return state.select(*sel)
