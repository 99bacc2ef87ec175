"""Data-quality gate: one aggregation pass over the batch.

Re-implements the reference's ``validate_data`` driver loop
(src/utils/validation.py:138-204 and per-type checks :303-399+) — null
counts per column, empty-string counts, max string length, non-finite
float counts, duplicate-row count, null-percentage gate — as a single
``agg()`` with conditional counters (deequ-style). One scan, fully
partial-aggregable, no matter how many columns: on 100 TB this is one
map-side pass instead of the reference's per-column Python loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def quality_aggregates(df: DataFrame) -> DataFrame:
    """A9: per-column metrics in ONE aggregation (reference :138-204)."""
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for fld in df.schema.fields:
        c = F.col(f"`{fld.name}`")
        n = fld.name
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{n}__nulls"))
        if isinstance(fld.dataType, T.StringType):
            aggs.append(F.count(F.when(c == "", 1)).alias(f"{n}__empty"))
            aggs.append(F.max(F.length(c)).cast("long").alias(f"{n}__max_len"))
        if isinstance(fld.dataType, (T.DoubleType, T.FloatType)):
            aggs.append(F.count(F.when(c.isNaN() | c.isin(float("inf"), float("-inf")), 1))
                         .alias(f"{n}__nonfinite"))
    return df.agg(*aggs)


def duplicate_row_count(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Duplicate count over key (or all) columns (reference duplicate-row
    check). Partial-aggregable two-level count, no window needed."""
    cols = key_cols or df.columns
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
              .agg(F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1)), F.lit(0))
                    .cast("long").alias("duplicate_rows")))


@dataclass
class QualityReport:
    passed: bool
    row_count: int
    violations: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def run_quality_gate(df: DataFrame, *, max_null_pct: float = 100.0,
                     not_null_cols: list[str] | None = None) -> QualityReport:
    """R9 gate (reference base.py:1109-1120): fail the batch before write
    when constraints are violated."""
    row = quality_aggregates(df).collect()[0].asDict()
    total = row["row_count"]
    violations: list[str] = []
    for col in (not_null_cols or []):
        if row.get(f"{col}__nulls", 0) > 0:
            violations.append(f"{col}: {row[f'{col}__nulls']} NULLs in NOT NULL column")
    if total > 0:
        for k, v in row.items():
            if k.endswith("__nulls") and v is not None:
                pct = 100.0 * v / total
                if pct > max_null_pct:
                    violations.append(f"{k[:-7]}: null {pct:.1f}% > {max_null_pct}%")
    return QualityReport(passed=not violations, row_count=total,
                         violations=violations, metrics=row)


def check_constraints(df: DataFrame,
                      constraints: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Declarative row-constraint audit (the deequ/Great-Expectations
    core in one aggregate): ``constraints`` is [(name, boolean Column)]
    and the output is one row per constraint —
    (constraint, n_rows, n_violations, pass) — computed in a SINGLE
    partial-aggregable scan regardless of how many constraints run.
    NULL predicate results count as violations (a null price fails
    ``price > 0``), matching SQL CHECK semantics under ``NOT (cond IS
    TRUE)``. Referential checks need a second relation — see
    :func:`fk_violations`."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, cond in constraints:
        aggs.append(
            F.count(F.when(~cond.eqNullSafe(True), 1)).alias(name))
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("constraint"),
                 F.col(name).alias("n_violations"))
        for name, _ in constraints])
    return (row.select(F.col("__rows").alias("n_rows"),
                       F.explode(pairs).alias("c"))
               .select(F.col("c.constraint").alias("constraint"),
                       "n_rows",
                       F.col("c.n_violations").alias("n_violations"),
                       (F.col("c.n_violations") == 0).alias("pass")))


def fk_violations(child: DataFrame, parent: DataFrame,
                  child_key: str, parent_key: str) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent.
    One left_anti join (AQE broadcasts the DISTINCT parent-key side
    while it is small; at dimension scale it degrades to a shuffled
    anti-join — never a per-row lookup). Output: one row
    (n_orphans, n_distinct_orphan_keys)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key, "left_anti")
    return orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.countDistinct(child_key).alias("n_distinct_orphan_keys"))


def psi_drift(ref: "DataFrame", cur: "DataFrame", col: str,
              n_buckets: int = 10, lo: float | None = None,
              hi: float | None = None, eps: float = 1e-6) -> "DataFrame":
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift gate for training-data distributions
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 drifted).

    Fixed-width buckets over [lo, hi] (defaults: the reference side's
    min/max — one 1-row agg), proportions per side, then
    ``sum((p_cur - p_ref) * ln(p_cur / p_ref))`` with epsilon smoothing
    so empty buckets stay finite. Scale shape: two partial-aggregable
    histogram groupBys (shuffle carries n_buckets rows per side) and a
    broadcast-sized join of the two histograms. Output: one row
    (psi, n_buckets, n_ref, n_cur)."""
    from pyspark.sql import functions as F

    if lo is None or hi is None:
        r = ref.agg(F.min(F.col(col).cast("double")),
                    F.max(F.col(col).cast("double"))).first()
        # an empty (or all-NULL) reference has no min/max: fall back to
        # the unit range so PSI stays finite, mirroring the empty-current
        # guard below (round-3 advisor finding)
        lo = lo if lo is not None else (float(r[0]) if r[0] is not None else 0.0)
        hi = hi if hi is not None else (float(r[1]) if r[1] is not None else 1.0)
    span = (hi - lo) or 1.0

    def hist(df, name):
        b = F.least(F.greatest(
            F.floor((F.col(col).cast("double") - F.lit(lo))
                    / F.lit(span) * n_buckets), F.lit(0)),
            F.lit(n_buckets - 1))
        return (df.select(b.cast("int").alias("bucket"))
                  .groupBy("bucket")
                  .agg(F.count(F.lit(1)).alias(name)))

    buckets = ref.sparkSession.range(n_buckets) \
        .select(F.col("id").cast("int").alias("bucket"))
    # localCheckpoint (lazy) so the n_buckets-row histogram relation is
    # computed ONCE and shared by the totals subtree and the PSI fold —
    # without it the crossJoin would replay both side scans, and the
    # former eager ``tot = h.agg(...).first()`` paid a THIRD replay
    # plus a driver action (r13 optimization: 3 actions -> 1, ref
    # scanned 2x instead of 3x, cur 1x instead of 2x). Caveat (ADVICE
    # r13): checkpoint blocks are executor-local, lineage-free storage
    # — fine for this n_buckets-row relation inside one query, but an
    # executor loss fails the plan and GC is the only unpersist path.
    h = (buckets.join(hist(ref, "n_ref"), "bucket", "left")
                .join(hist(cur, "n_cur"), "bucket", "left")
                .fillna(0, ["n_ref", "n_cur"])
                .localCheckpoint(eager=False))
    # greatest(total, 1) keeps an empty side finite (PSI is then just
    # the eps-smoothed divergence from an all-zero histogram, not NaN)
    tot = h.agg(
        F.greatest(F.sum("n_ref"), F.lit(1)).cast("double").alias("__tr"),
        F.greatest(F.sum("n_cur"), F.lit(1)).cast("double").alias("__tc"))
    p_ref = F.col("n_ref") / F.col("__tr") + F.lit(eps)
    p_cur = F.col("n_cur") / F.col("__tc") + F.lit(eps)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (h.crossJoin(tot)
             .agg(F.round(F.sum(term), 6).alias("psi"),
                  F.lit(n_buckets).alias("n_buckets"),
                  F.sum("n_ref").alias("n_ref_rows"),
                  F.sum("n_cur").alias("n_cur_rows")))


def group_zscore_outliers(df: "DataFrame", group_col: str, value_col: str,
                          z_threshold: float = 2.5) -> "DataFrame":
    """Per-group z-score anomaly flagging: rows whose value sits more
    than ``z_threshold`` population standard deviations from their
    group's mean — the load-time outlier screen for numeric columns
    (precedes winsorization/clipping in a curation funnel).

    Shape: one partial-aggregable groupBy to (mean, stddev_pop, n) per
    group — the stats relation has one row per group, so its join back
    onto the fact side is AQE-broadcastable for any realistic group
    cardinality; the fact table itself is touched once and never
    shuffled (the join key arrives via broadcast). Zero-variance groups
    produce no outliers by definition (guarded against div-by-zero).
    Output: (group, value-row id columns, value, z) filtered to
    |z| > threshold."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("double")
    stats = (df.groupBy(group_col)
               .agg(F.avg(v).alias("__mu"),
                    F.stddev_pop(v).alias("__sigma")))
    joined = df.join(F.broadcast(stats), group_col)
    z = F.round((v - F.col("__mu")) / F.col("__sigma"), 6)
    return (joined
            .filter(F.col("__sigma") > 0)
            .withColumn("z", z)
            .filter(F.abs(F.col("z")) > z_threshold)
            .drop("__mu", "__sigma"))


def id_gap_audit(df: DataFrame, id_col: str,
                 num_partitions: int | None = None,
                 checkpoint: bool = True) -> DataFrame:
    """Holes in a key sequence — the row-loss detector for id_only /
    hybrid CDC (a gap at the target means rows were skipped or lost in
    flight) — WITHOUT the global single-partition lag window.

    ``lag(id) OVER (ORDER BY id)`` with no PARTITION BY funnels the
    whole table through one task. But a gap is a property of ADJACENT
    ids, so after a range repartition (partition i holds a contiguous
    id range strictly below partition i+1's) every adjacent pair is
    co-located except the one pair straddling each partition boundary:

    1. ``repartitionByRange`` + local sort on id — the only wide op;
    2. per-partition lag (window PARTITIONED by
       ``spark_partition_id()`` — every partition scans in parallel)
       finds all intra-partition gaps;
    3. per-partition (min, max) — an O(num_partitions)-row aggregate,
       COLLECTED to the driver (O(tasks) integer pairs, the same class
       as parquet footer counts) and stitched in plain Python: each
       non-empty partition's min pairs with the previous non-empty
       partition's max, catching gaps that straddle (or entirely
       swallow) partition boundaries. Driver-side on purpose — the
       alternative is a single-partition lag window over the bounds,
       an extra exchange + WindowExec for a 32-element zip.

    The ranged relation is lazily localCheckpointed so the boundary
    aggregate and the data-side window consume the SAME materialized
    exchange — a task retry re-sampling different range boundaries
    would otherwise let (2) and (3) disagree. Duplicated ids are not
    gaps (diff 0). Returns (gap_start, gap_end, missing); the empty
    result IS the pass condition in production.
    """
    from pyspark.sql.window import Window

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.select(F.col(id_col).cast("long").alias("id"))
                .repartitionByRange(n, "id")
                .sortWithinPartitions("id")
                .withColumn("__pid", F.spark_partition_id()))
    if checkpoint:   # checkpoint=False is for plan inspection in tests
        ranged = ranged.localCheckpoint(eager=False)
    local_w = Window.partitionBy("__pid").orderBy("id")
    local = (ranged.withColumn("prev", F.lag("id").over(local_w))
                   .filter(F.col("prev").isNotNull()
                           & (F.col("id") - F.col("prev") > 1)))
    # tiny relation: one row per non-empty partition -> driver stitch
    bounds = sorted((r["__pid"], r["lo"], r["hi"]) for r in
                    ranged.groupBy("__pid")
                          .agg(F.min("id").alias("lo"),
                               F.max("id").alias("hi")).collect())
    straddle, prev_hi = [], None
    for _, lo, hi in bounds:
        if prev_hi is not None and lo - prev_hi > 1:
            straddle.append((lo, prev_hi))
        prev_hi = max(prev_hi, hi) if prev_hi is not None else hi
    cross = df.sparkSession.createDataFrame(
        straddle or [], "id long, prev long")
    gaps = local.select("id", "prev").unionByName(cross)
    return gaps.select((F.col("prev") + 1).alias("gap_start"),
                       (F.col("id") - 1).alias("gap_end"),
                       (F.col("id") - F.col("prev") - 1).alias("missing"))


def robust_outlier_stats(df: DataFrame, group_col: str, value_col: str,
                         n_sigmas: float = 3.0,
                         round_dp: int = 6) -> DataFrame:
    """Median/MAD robust outlier screen per group: flags values whose
    absolute deviation from the group median exceeds ``n_sigmas`` robust
    sigmas (MAD * 1.4826, the normal-consistency constant). Mean/stddev
    gates (the reference's validation thresholds are all mean-based,
    src/utils/validation.py) move with the outliers they hunt; the
    median pair does not.

    Exact interpolated percentiles (type-7, matching quantile_cont) via
    two grouped passes — median, then median absolute deviation — each a
    co-partitioned groupBy + broadcast-size join back. Scale note: EXACT
    per-group percentile holds per-group value multisets in the
    aggregation state; at 100 TB swap the two `percentile` calls for
    `approx_percentile` (same plan shape, mergeable KLL-style state) —
    this operator pins the exact twin the approximation is judged
    against (approx_percentile_check_lineitem does exactly that
    comparison in-registry)."""
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med"))
    dev = (df.join(med, group_col)
             .withColumn("__dev", F.abs(F.col(value_col) - F.col("__med"))))
    mad = dev.groupBy(group_col).agg(
        F.max("__med").alias("med"),  # constant per group
        F.percentile("__dev", F.lit(0.5)).alias("mad"),
        F.count(F.lit(1)).alias("n"))
    flag = (dev.join(mad.select(group_col, "mad"), group_col)
               .where(F.col("__dev") > F.lit(n_sigmas) * F.lit(1.4826)
                      * F.col("mad"))
               .groupBy(group_col)
               .agg(F.count(F.lit(1)).alias("n_outliers")))
    return (mad.join(flag, group_col, "left_outer")
               .select(group_col,
                       F.round("med", round_dp).alias("med"),
                       F.round("mad", round_dp).alias("mad"),
                       F.col("n"),
                       F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
                       F.round(F.coalesce("n_outliers", F.lit(0))
                               * F.lit(1.0) / F.col("n"), round_dp)
                        .alias("outlier_rate")))


def checksum_audit(df: DataFrame, part_cols: list[str],
                   cols: list[str] | None = None) -> DataFrame:
    """Order-independent per-partition content fingerprint: row count +
    bit_xor of a portable per-row hash over ``cols`` (default: every
    column), cast to string with '|' separators and NULLs marked.

    The reference verifies loads by COUNT alone (validation.py row-count
    check) — counts match even when values were mangled in transit. XOR
    of row hashes is commutative/associative, so the aggregate is
    partition-order- and shuffle-independent, fully partial-aggregable,
    and comparable across engines AND across sides of a sync (staging vs
    warehouse): equal fingerprints == equal multisets of rows, up to
    md5-collision odds. One scan, no shuffle beyond the tiny group agg.

    Caveat (honest): XOR cancels PAIRS of identical rows — a row
    duplicated twice vanishes from the fingerprint. The row count column
    catches exact-duplicate injection; treat (count, xor) as one signal.
    """
    from .text import md5_prefix_int
    cols = cols or [c for c in df.columns]
    parts = [F.when(F.col(c).isNull(), F.lit("\\N"))
              .otherwise(F.col(c).cast("string")) for c in cols]
    rowhash = md5_prefix_int(F.concat_ws("|", *parts))
    return (df.groupBy(*part_cols)
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.bit_xor(rowhash).alias("content_xor")))


def numeric_histogram(df: DataFrame, value_col: str, bins: int = 10,
                      lo: float | None = None,
                      hi: float | None = None) -> DataFrame:
    """Equi-width histogram of a numeric column: the profiling primitive
    behind distribution drift checks and UI sparklines. Bounds default
    to the column's min/max (one scalar agg); bucket = floor((v - lo) *
    bins / (hi - lo)) capped into [0, bins-1] — plain double arithmetic
    expressible identically in any engine (no width_bucket dependency).
    One partial-aggregable groupBy over at most ``bins`` keys; NULLs
    are reported as their own row (bucket NULL) rather than dropped."""
    if lo is None or hi is None:
        row = df.agg(F.min(value_col).alias("lo"),
                     F.max(value_col).alias("hi")).first()
        if row["lo"] is None or row["hi"] is None:
            # entirely-NULL (or empty) column: there is no data range to
            # bucket — return the NULL-bucket-only histogram directly
            return (df.where(F.col(value_col).isNull())
                      .groupBy(F.lit(None).cast("int").alias("bucket"))
                      .agg(F.count(F.lit(1)).alias("n"))
                      .withColumn("lo", F.lit(None).cast("double")))
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    v = F.col(value_col).cast("double")
    if hi <= lo:
        bucket = F.when(v.isNull(), F.lit(None)).otherwise(F.lit(0))
    else:
        raw = F.floor((v - F.lit(lo)) * F.lit(float(bins))
                      / (F.lit(hi) - F.lit(lo)))
        bucket = F.when(v.isNull(), F.lit(None).cast("int")) \
                  .otherwise(F.least(F.greatest(raw, F.lit(0)),
                                     F.lit(bins - 1)).cast("int"))
    return (df.groupBy(bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n"))
              .withColumn("lo", F.round(F.lit(lo)
                          + F.col("bucket") * (F.lit(hi) - F.lit(lo))
                          / F.lit(float(bins)), 6)))


def fk_orphan_audit(facts: DataFrame, fact_key: str,
                    dim: DataFrame, dim_key: str) -> DataFrame:
    """Referential-integrity probe: how many fact rows point at a
    missing dimension key (and how many point at NULL). The reference
    trusts source FKs blindly; after partial syncs or out-of-order
    loads the orphan rate is the first thing to check before joining.

    ONE pass, fully lazy (r13 optimization — was three driver-action
    passes: facts.count(), non-null count, anti-join count, plus a
    driver-built result row): a left join against the DISTINCT
    dimension keys (distinct ⇒ the join cannot multiply fact rows)
    marks each fact row hit/miss, and a single aggregate counts rows,
    NULL keys (which never match an equality join) and orphans
    (non-NULL key, no hit) together. NULL-keyed rows stay counted
    separately — anti-join semantics would silently lump them with
    orphans."""
    dk = (dim.select(F.col(dim_key).alias(fact_key)).distinct()
             .withColumn("__hit", F.lit(1)))
    j = facts.select(fact_key).join(dk, [fact_key], "left")
    agg = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(fact_key).isNull(), 1)).alias("n_null_keys"),
        F.count(F.when(F.col(fact_key).isNotNull()
                       & F.col("__hit").isNull(), 1)).alias("n_orphans"))
    return agg.select(
        "n_rows", "n_null_keys", "n_orphans",
        F.when(F.col("n_rows") == 0, F.lit(0.0))
         .otherwise(F.round(F.col("n_orphans") * F.lit(1.0)
                            / F.col("n_rows"), 6))
         .alias("orphan_rate"))
