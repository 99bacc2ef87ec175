"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference pipeline has no relational joins at all (SURVEY §2.3;
reference `src/core/gemini_redshift_loader.py:499-527` is the closest —
a set-difference), but any analytics consumer of its CDC output needs
event-time joins. Both operators here are built from stock DataFrame
primitives so Catalyst plans them; neither materializes an O(n*m)
intermediate.

* ``asof_join`` — for each left row, the latest right row with
  ``right.ts <= left.ts`` (optionally strict) per key. Implemented as a
  tagged union + ``last(..., ignorenulls=True)`` over a key-partitioned
  window: ONE shuffle on the key, no range-duplicated rows, scales to
  arbitrarily long histories per key (sort-based window, spills).

* ``range_join_bucketed`` — pairs (l, r) with ``r.ts`` in
  ``[l.ts + lower, l.ts + upper)`` per key. Right rows are assigned one
  time bucket; left rows duplicate only across the O(window/bucket)
  buckets their interval spans. The equi-join on (key, bucket) is a
  plain shuffle/broadcast hash join; the exact interval predicate
  filters residues after the join. At 100 TB this is the standard
  replacement for Spark's cartesian-range-join plan, which degenerates
  to BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row's ts.

    Every left row is kept (unmatched rows get null right columns), like
    pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN``. ``right_cols``
    defaults to all non-key right columns; they must not collide with
    left column names (alias before calling). ``right_tiebreak`` makes
    the pick deterministic when several right rows share one timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    left_payload = [c for c in left.columns if c not in keys]
    clash = set(right_cols) & set(left_payload)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    # Right rows must sort before left rows at equal ts to be eligible
    # matches (inclusive); after them for a strict as-of.
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*left_payload).alias("__l"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.struct(*right_cols).alias("__r"),
    )
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_tiebreak is not None:
        order.append(F.col("__r").getField(right_tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    u = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    return u.filter(F.col("__l").isNotNull()).select(
        *keys,
        *[F.col(f"__l.{c}").alias(c) for c in left_payload],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )


def _bucket(ts_us: Column, bucket_us: int) -> Column:
    return F.floor(ts_us / F.lit(bucket_us))


def interpolate_linear(df: DataFrame, key_col: str, order_col: str,
                       value_col: str,
                       out_col: str = "value_filled") -> DataFrame:
    """Per-key linear interpolation of missing (NULL) values over an
    ordered series — the gap-filler for sensor/feature pipelines where
    a dropped reading must not become a dropped row (the calendar-spine
    gap-fill's row-level sibling: that creates missing ROWS, this
    repairs missing VALUES).

    Four windows over the SAME (key, order) partitioning — Spark plans
    them on one exchange + one sort, not four: running last non-null
    value/position backward, first non-null forward, then the affine
    blend ``prev + (next-prev) * (t-t_prev)/(t_next-t_prev)``. Edge
    policy: leading nulls backfill, trailing nulls forward-fill,
    coincident timestamps fall back to the previous value (no 0/0).
    ``order_col`` must be numeric (epoch seconds/micros)."""
    k, t, v = F.col(key_col), F.col(order_col), F.col(value_col)
    w_prev = (Window.partitionBy(k).orderBy(t)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(k).orderBy(t)
              .rowsBetween(0, Window.unboundedFollowing))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)
    blend = (prev_v + (next_v - prev_v)
             * (t - prev_t) / (next_t - prev_t))
    filled = (F.when(v.isNotNull(), v)
               .when(prev_v.isNull(), next_v)        # leading gap
               .when(next_v.isNull(), prev_v)        # trailing gap
               .when(next_t == prev_t, prev_v)       # coincident ts
               .otherwise(blend))
    return df.withColumn(out_col, filled)


def ewma_by_key(df: DataFrame, key_col: str, order_col: str,
                value_col: str, alpha: float = 0.3,
                out_col: str = "ewma") -> DataFrame:
    """Final exponentially-weighted moving average per key:
    ``s_i = alpha*v_i + (1-alpha)*s_{i-1}``, seeded with the first
    observation — the standard recency-weighted feature (user spend
    level, sensor baseline) that a plain window cannot express because
    the recurrence is not associative.

    Shape: one groupBy collecting the ordered series per key, then a
    per-row left fold (``F.aggregate``) — the recurrence runs inside
    codegen, not Python. The collected array bounds this to series
    that fit in executor memory (sessions, daily windows, per-user
    event history); for UNBOUNDED series, chunk by time window and
    chain the carry (s is itself the sufficient statistic, so the
    chunked fold is exact). NULL values must be filtered by the
    caller (a NULL would poison the fold). Output:
    (key, n_points, out_col)."""
    a = float(alpha)
    series = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("t"),
                 F.col(value_col).alias("v"))))
    vals = F.transform(F.col("__s"), lambda s: s["v"].cast("double"))
    init = F.element_at(vals, 1)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    fold = F.aggregate(
        rest, init,
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc)
    return (df.groupBy(key_col)
              .agg(series.alias("__s"))
              .select(F.col(key_col),
                      F.size("__s").alias("n_points"),
                      fold.alias(out_col)))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_s: int = 3600,
    suffix_collisions: str | None = None,
) -> DataFrame:
    """Inner interval-x-interval overlap join: pairs rows whose CLOSED
    intervals ``[l.start, l.end]`` and ``[r.start, r.end]`` intersect
    (and share the equi keys). The third temporal-join family next to
    :func:`asof_join` (point-to-latest-point) and
    :func:`range_join_bucketed` (point-in-window).

    The naive formulation is a non-equi theta join — Catalyst can only
    run it as a nested loop, O(n x m) per key at 100 TB. Here each
    interval explodes into the fixed-width buckets it covers and the
    join is an ordinary hash equi-join on (keys, bucket). A pair whose
    intervals share several buckets would match repeatedly, so instead
    of a distinct (a second full shuffle) each pair is emitted ONLY in
    the bucket containing the overlap's own start,
    ``greatest(l.start, r.start)`` — exactly one bucket per pair, no
    dedup pass. Cost knob: ``bucket_s`` trades row duplication
    (ceil(interval_len/bucket)+1 copies) against per-bucket join
    fan-out; size it near the median interval length.

    The output carries every left column plus every non-key right
    column, selected BY NAME — so the two inputs must not share any
    non-key column name. By default collisions are rejected up front
    with the offending names rather than surfacing as an ambiguous-
    reference error deep in the final select; pass
    ``suffix_collisions="_r"`` (pandas ``_x``/``_y`` style, opt-in) to
    auto-rename the RIGHT side's colliding columns instead — the
    self-join case then needs no manual pre-renaming."""
    keys = [on] if isinstance(on, str) else list(on)
    clash = sorted((set(left.columns) & set(right.columns)) - set(keys))
    if clash and suffix_collisions is not None:
        if not suffix_collisions:
            raise ValueError("suffix_collisions must be a non-empty suffix")
        rename = {c: c + suffix_collisions for c in clash}
        new_right = [rename.get(c, c) for c in right.columns]
        still = sorted((set(new_right) & set(left.columns)) - set(keys))
        if len(set(new_right)) != len(new_right):
            still = sorted(set(still)
                           | {c for c in new_right if new_right.count(c) > 1})
        if still:
            raise ValueError(
                f"interval_overlap_join: suffixed names {still} still "
                f"collide; pick a different suffix_collisions")
        if right_start in rename:
            right_start = rename[right_start]
        if right_end in rename:
            right_end = rename[right_end]
        right = right.withColumnsRenamed(rename)
        clash = []
    if clash:
        raise ValueError(
            f"interval_overlap_join: non-key column names collide "
            f"between left and right: {clash}; rename one side "
            f"(e.g. right.withColumnsRenamed) before joining, or pass "
            f"suffix_collisions='_r' to auto-suffix the right side")
    bucket_us = bucket_s * 1_000_000

    def _cover(df: DataFrame, s: str, e: str) -> DataFrame:
        sus, eus = F.unix_micros(F.col(s)), F.unix_micros(F.col(e))
        # inverted intervals (end < start) are dropped, NOT exploded:
        # F.sequence silently steps DOWNWARD for them, which would
        # fabricate buckets the interval never covers
        return (df.filter(eus >= sus)
                  .withColumn("__sus", sus)
                  .withColumn("__eus", eus)
                  .withColumn("__bucket", F.explode(F.sequence(
                      _bucket(sus, bucket_us), _bucket(eus, bucket_us)))))

    l2 = _cover(left, left_start, left_end)
    r2 = _cover(right, right_start, right_end) \
        .withColumnsRenamed({"__sus": "__rsus", "__eus": "__reus"})
    joined = (l2.join(r2, keys + ["__bucket"])
                .filter((F.col("__sus") <= F.col("__reus"))
                        & (F.col("__rsus") <= F.col("__eus")))
                .filter(F.col("__bucket")
                        == _bucket(F.greatest(F.col("__sus"),
                                              F.col("__rsus")), bucket_us)))
    out_cols = (keys
                + [c for c in left.columns if c not in keys]
                + [c for c in right.columns if c not in keys])
    return joined.select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner range join: rows paired when r.ts ∈ [l.ts+lower_s, l.ts+upper_s).

    Output = all left columns + all non-key right columns (alias
    collisions are the caller's job, as with any join). ``bucket_s``
    trades left-row duplication (window/bucket copies) against residual
    filter selectivity; default 1 bucket per hour.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    keys = [on] if isinstance(on, str) else list(on)
    bucket_us = bucket_s * 1_000_000
    lower_us, upper_us = int(lower_s * 1e6), int(upper_s * 1e6)

    r2 = right.withColumn("__rus", F.unix_micros(F.col(right_ts))).withColumn(
        "__bucket", _bucket(F.col("__rus"), bucket_us)
    )
    l2 = (
        left.withColumn("__lus", F.unix_micros(F.col(left_ts)))
        .withColumn("__lo", F.col("__lus") + F.lit(lower_us))
        .withColumn("__hi", F.col("__lus") + F.lit(upper_us))  # exclusive
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    _bucket(F.col("__lo"), bucket_us),
                    _bucket(F.col("__hi") - 1, bucket_us),
                )
            ),
        )
    )
    joined = l2.join(r2, keys + ["__bucket"]).filter(
        (F.col("__rus") >= F.col("__lo")) & (F.col("__rus") < F.col("__hi"))
    )
    out_cols = (
        keys
        + [c for c in left.columns if c not in keys]
        + [c for c in right.columns if c not in keys]
    )
    return joined.select(*out_cols)


# --------------------------------------------------------------------------
# Ordered-funnel conversion analysis
# --------------------------------------------------------------------------

def funnel_steps(df: DataFrame, user_col: str, ts_col: str,
                 type_col: str, steps: list[str],
                 checkpoint: bool = True) -> list[DataFrame]:
    """Per-user earliest STRICTLY-ORDERED completion time of each funnel
    step: step i counts only events after the user's step-(i-1) time.

    Each stage is filter -> groupBy(user) -> min(ts), joined to the
    previous stage on the user key — after the first stage every join
    and aggregation is co-partitioned on hash(user), so the funnel costs
    one user-key shuffle plus per-stage map work no matter how many
    steps. Returns one DataFrame per step: (user_col, t_i).

    With ``checkpoint`` (default) each stage is lazily localCheckpoint'd
    (r13 optimization, guide §5): stage i's plan CONTAINS stages
    1..i-1, so a k-step funnel whose stages are consumed separately
    (funnel_conversions crossJoins all k counts) would otherwise
    re-derive stage 1 k times and re-scan the event source O(k^2/2)
    times — static exchange reuse does not fire across the
    differently-aliased subtrees (measured: 12 source scans, 0
    ReusedExchange for the 3-step funnel). Materialized, each
    |users|-row stage is computed once and every later consumer reads
    it back. Trade-offs (ADVICE r13): the checkpointed stages are
    LogicalRDD-backed, so callers lose filter/column pushdown into the
    event source (asking for one user's funnel still materializes the
    full stages); the blocks live on executors WITHOUT lineage (an
    executor loss makes the plan fail — acceptable for a query, not
    for long-lived reuse) and are freed only by JVM GC. Pass
    ``checkpoint=False`` to keep the stages as pure composable plans."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, ev_type in enumerate(steps):
        cur = df.where(F.col(type_col) == ev_type)
        if prev is not None:
            cur = (cur.join(prev, user_col)
                      .where(F.col(ts_col) > F.col(f"t{i - 1}")))
        stage = cur.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        if checkpoint:
            stage = stage.localCheckpoint(eager=False)
        out.append(stage)
        prev = stage
    return out


def funnel_conversions(df: DataFrame, user_col: str, ts_col: str,
                       type_col: str, steps: list[str],
                       round_dp: int = 6) -> DataFrame:
    """One-row funnel summary: users completing each step (in order)
    plus step-to-step conversion rates. The per-step relations collapse
    to 1-row counts before the final crossJoin — broadcast-class, the
    same bounded-crossJoin idiom as the corpus-stats queries."""
    stages = funnel_steps(df, user_col, ts_col, type_col, steps)
    counts = [s.agg(F.count(F.lit(1)).alias(f"users_{name}"))
              for s, name in zip(stages, steps)]
    row = counts[0]
    for c in counts[1:]:
        row = row.crossJoin(c)
    sel = [F.col(f"users_{n}") for n in steps]
    for a, b in zip(steps, steps[1:]):
        sel.append(F.round(F.col(f"users_{b}") * F.lit(1.0)
                           / F.col(f"users_{a}"), round_dp)
                    .alias(f"conv_{a}_{b}"))
    return row.select(*sel)


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     round_dp: int = 6) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week; cell
    (cohort, offset_w) = share of the cohort active offset_w weeks
    later — the standard product-analytics retention triangle.

    Shuffle shape: first-seen = one groupBy(user); activity = distinct
    (user, week); the cohort join rides the user key; the final matrix
    is a groupBy over (cohort, offset) with count(DISTINCT user) —
    every stage partial-aggregates and nothing exceeds |users| rows.
    Week offsets come from epoch arithmetic on week-truncated naive-UTC
    timestamps (exact multiples of 604800 s — no DST in the data
    model), not calendar week-boundary counting, so both engines agree
    on every cell."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = (df.groupBy(user_col)
               .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort")))
    active = df.select(F.col(user_col), wk.alias("wk")).distinct()
    j = active.join(first, user_col)
    off = ((F.unix_timestamp("wk") - F.unix_timestamp("cohort"))
           / F.lit(604800)).cast("int")
    cells = (j.groupBy("cohort", off.alias("offset_w"))
              .agg(F.countDistinct(user_col).alias("active_users")))
    size = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_n"))
    out = cells.join(size, "cohort")
    return out.select(
        "cohort", "offset_w", "active_users", "cohort_n",
        F.round(F.col("active_users") * F.lit(1.0) / F.col("cohort_n"),
                round_dp).alias("retention"))


def top_session_paths(df: DataFrame, user_col: str, ts_col: str,
                      type_col: str, gap_minutes: int = 30,
                      top_n: int = 20,
                      tiebreak_col: str | None = None) -> DataFrame:
    """Most common event paths per session: sessionize (same gap rule
    as session_window), assemble each session's ordered event-type
    string, count paths, keep the global top N — the "how do users
    actually move" report behind funnel design.

    The per-session ordering happens INSIDE an aggregated array
    (sort_array over collect_list of (ts, tiebreak, type) structs), so
    the sort is bounded by one session's events — no global or
    per-user-history window. Path strings shuffle as grouped keys with
    map-side partial counts; the final top-N is a TakeOrdered over
    |distinct paths|."""
    order_cols = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap = (F.unix_timestamp(ts_col)
           - F.unix_timestamp(F.lag(ts_col).over(w)))
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1) \
                .otherwise(0)
    sess = (df.withColumn("__new", new_sess)
              .withColumn("__sid", F.sum("__new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    struct_cols = [F.col(ts_col).alias("t")] + (
        [F.col(tiebreak_col).alias("tb")] if tiebreak_col else []) + [
        F.col(type_col).alias("e")]
    paths = (sess.groupBy(user_col, "__sid")
                 .agg(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(F.struct(*struct_cols))),
                         lambda s: s["e"]),
                     ">").alias("path")))
    return (paths.groupBy("path")
                 .agg(F.count(F.lit(1)).alias("n_sessions"))
                 .orderBy(F.desc("n_sessions"), "path")
                 .limit(top_n))
