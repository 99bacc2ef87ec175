"""Deterministic sampling and dataset splitting for training pipelines.

Seed-based sampling (``df.sample``) is engine- and partitioning-
dependent — rerun the job, get different rows. Hash-gate sampling is the
reproducible alternative used in large corpus pipelines: a row is
sampled iff ``hash(key) mod D < rate*D``. Properties that matter at
100 TB:

- deterministic: same key set -> same sample, on any engine, any
  partitioning, any day (the DuckDB oracle reproduces it exactly);
- narrow: a per-row filter, no shuffle, fully pushdown-composable;
- consistent: nested rates are supersets (a 1% sample is contained in
  the 10% sample), so curriculum/ablation subsets nest for free;
- splittable: disjoint hash ranges give leak-free train/val/test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_prefix_int

#: denominator of the hash gate (1e6 -> rate resolution of 0.0001%)
GATE = 1_000_000


def hash_gate(key: Column, salt: str = "") -> Column:
    """Uniform value in [0, GATE) derived from the key (+ optional salt
    so independent samples decorrelate)."""
    return md5_prefix_int(key.cast("string"), salt=salt) % GATE


def sample_by_hash(df: DataFrame, key_col: str, rate: float,
                   salt: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by key hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_gate(F.col(key_col), salt) < int(rate * GATE))


def sample_by_hash_complement(df: DataFrame, key_col: str, rate: float,
                              salt: str = "") -> DataFrame:
    """EXACTLY the rows :func:`sample_by_hash` drops, as a narrow
    FILTER (``gate >= rate*GATE``). The deterministic gate makes the
    two calls a disjoint, exhaustive partition of ``df`` — so an
    eval/train split needs NO anti-join: ``df MINUS sample`` realized
    as an O(E)-shuffle join is a filter here (r13 optimization; the
    decontamination entries' oracles already state the split this
    way: ``g >= rate*GATE``)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_gate(F.col(key_col), salt) >= int(rate * GATE))


def split_by_hash(df: DataFrame, key_col: str,
                  fractions: dict[str, float],
                  salt: str = "", split_col: str = "split") -> DataFrame:
    """Disjoint, exhaustive, leak-free dataset split: each row gets the
    split label whose cumulative hash range contains its gate value.
    Fractions must sum to 1 (within rounding)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    gate = hash_gate(F.col(key_col), salt)
    expr, acc = None, 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = gate < int(acc * GATE)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def weighted_sample_exact_k(df: DataFrame, group_col: str, k: int,
                            weight: Column, key_col: str,
                            salt: str = "") -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement per group
    (Efraimidis-Spirakis'06 exponential race): each row draws
    ``e = -ln(u) / w`` with u from the deterministic hash gate, and the
    k smallest per group win — inclusion probability proportional to
    weight, no replacement, reproducible across runs/partitionings/
    engines because u is a pure function of the key.

    This is what ``importance_sample`` (Bernoulli, random SIZE) cannot
    give: a fixed budget per group with weight-proportional selection —
    'exactly 10k docs per source, preferring high-quality ones'.
    Shape: narrow per-row math + one per-group top-k window (partitions
    are group-sized; a group too hot for one task goes through
    ``skew.grouped_topk_sharded`` — shard-local top-k then a bounded
    re-rank, exact because a group's global top-k is contained in the
    union of its shard top-ks).
    Rows with weight <= 0 or NULL are excluded (they'd win with
    infinite keys)."""
    from pyspark.sql.window import Window
    u = (hash_gate(F.col(key_col), salt) + F.lit(0.5)) / F.lit(GATE)
    e = -F.log(u) / weight
    w = Window.partitionBy(group_col).orderBy(F.asc("__es"),
                                              F.asc(key_col))
    return (df.filter(weight.isNotNull() & (weight > 0))
              .withColumn("__es", e)
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k)
              .drop("__es", "__rn"))


def cluster_safe_split(df: DataFrame, key_col: str,
                       components: DataFrame,
                       fractions: dict[str, float], salt: str = "",
                       split_col: str = "split",
                       component_col: str = "component") -> DataFrame:
    """Leak-free split that keeps NEAR-DUPLICATES together: the hash
    gate is keyed on the row's dedup-cluster representative (its
    connected-component label from ``dedup.neardup_components``), not
    the row id — so two 95%-identical documents can never land one in
    train and one in test and quietly inflate eval, the leakage
    ``split_by_hash`` alone cannot see (Lee et al.'21 measure it).
    Singletons (absent from ``components``) gate on their own key.

    Scale shape: one left join of the corpus against the component map
    (components only holds docs that appear in a dup pair — usually a
    small fraction — so AQE broadcasts it while small), then the same
    narrow hash-range assignment as ``split_by_hash``. Rows sharing a
    cluster share a gate value, hence a split, by construction."""
    joined = df.join(components, key_col, "left").withColumn(
        "__rep", F.coalesce(F.col(component_col), F.col(key_col)))
    out = split_by_hash(joined, "__rep", fractions, salt, split_col)
    return out.drop("__rep", component_col)


def pack_sequences(df: DataFrame, key_col: str, token_col,
                   budget: int, buckets: int = 32) -> DataFrame:
    """Deterministic token-budget sequence packing: assign each document
    a pack id such that consecutive docs (in hash order) fill ~``budget``
    tokens per pack — the batch-construction step of LLM training prep.

    A single global cumulative sum would serialize through one task, so
    packing is two-level: docs hash into ``buckets`` independent streams,
    each packed by a window cumulative sum partitioned by bucket — the
    window is partition-parallel and the whole op is one shuffle on the
    bucket key. Hash order makes the packing engine/partitioning/
    rerun-independent. Packs can exceed budget by at most one document
    (greedy boundary; oversized docs get their own pack).

    Output: (key, n_tokens, bucket, pack_id); pack_id is globally unique
    (bucket-prefixed)."""
    from pyspark.sql import Window
    tok = token_col if isinstance(token_col, Column) else F.col(token_col)
    g = hash_gate(F.col(key_col))
    base = df.select(F.col(key_col), tok.cast("long").alias("n_tokens"),
                     g.alias("__g"), (g % buckets).alias("bucket"))
    w = (Window.partitionBy("bucket").orderBy("__g", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # bucket occupies the high bits (shift, not a decimal stride): a
    # bucket would need 2^40 ≈ 1.1e12 packs (~budget*2^40 tokens) before
    # colliding with the next bucket's range — unreachable even at
    # 100 TB, where a 1e6 stride was not.
    pack = (F.shiftleft(F.col("bucket").cast("long"), 40)
            .bitwiseOR(F.floor(cum_excl / F.lit(budget))))
    return base.select(key_col, "n_tokens", "bucket",
                       pack.alias("pack_id"))


def pack_manifests(packed: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Turn :func:`pack_sequences` assignments into per-pack MANIFESTS —
    the contract a tensor-building loader actually consumes: for each
    pack, the ordered member list and the attention-boundary offsets
    (exclusive prefix sums of member lengths), so cross-document
    attention can be masked without re-deriving anything. One groupBy
    on pack_id; members are ordered by the same deterministic
    (hash, key) order packing used, so manifests are reproducible
    across runs/engines. Output:
    (pack_id, n_docs, total_tokens, member_ids, boundaries) — the
    boundaries array has n_docs entries starting at 0."""
    members = F.array_sort(F.collect_list(
        F.struct(F.col("__g"), F.col(key_col).alias("k"),
                 F.col("n_tokens").alias("t"))))
    # exclusive prefix sum over the ordered member lengths
    bounds = F.slice(
        F.aggregate(
            F.col("__m"),
            F.array(F.lit(0).cast("long")),
            lambda acc, x: F.concat(
                acc, F.array(F.element_at(acc, -1) + x["t"]))),
        1, F.size("__m"))
    return (packed
            .withColumn("__g", hash_gate(F.col(key_col)))
            .groupBy("pack_id")
            .agg(members.alias("__m"))
            .select("pack_id",
                    F.size("__m").alias("n_docs"),
                    F.aggregate(F.col("__m"), F.lit(0).cast("long"),
                                lambda acc, x: acc + x["t"])
                     .alias("total_tokens"),
                    F.transform("__m", lambda s: s["k"])
                     .alias("member_ids"),
                    bounds.alias("boundaries")))


def chunk_documents(df: DataFrame, key_col: str, text_col,
                    max_tokens: int, stride: int | None = None,
                    id_out: str = "chunk_idx",
                    text_out: str = "chunk_text") -> DataFrame:
    """Split long documents into ``max_tokens``-token windows with
    optional overlap (``stride`` < max_tokens) — the dual of
    :func:`pack_sequences`: packing joins short docs up to the context
    length, chunking cuts long docs down to it.

    Per-row array math + one explode; no shuffle at all (chunk rows stay
    on their document's partition until a downstream op asks otherwise).
    Deterministic boundaries: chunk i covers tokens
    [i*stride, i*stride + max_tokens). Output: (key, chunk_idx,
    chunk_text, n_tokens)."""
    stride = stride or max_tokens
    if stride <= 0 or stride > max_tokens:
        raise ValueError("stride must be in (0, max_tokens]")
    toks = (text_col if isinstance(text_col, Column)
            else F.split(F.col(text_col), " "))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - max_tokens) / F.lit(stride)) + 1, F.lit(1)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx, lambda i: F.struct(
            i.cast("int").alias("i"),
            F.slice(toks, i * stride + 1, F.lit(max_tokens)).alias("t")))
    ex = df.select(F.col(key_col), F.explode(chunks).alias("c"))
    return ex.select(
        key_col,
        F.col("c.i").alias(id_out),
        F.concat_ws(" ", F.col("c.t")).alias(text_out),
        F.size("c.t").cast("long").alias("n_tokens"))


def importance_sample(df: DataFrame, key_col: str, weight: Column,
                      salt: str = "") -> DataFrame:
    """Deterministic importance-weighted sampling: keep a row iff
    ``hash(key) mod GATE < clamp(weight, 0, 1) * GATE`` — each row's
    keep probability equals its weight (DSIR-style quality-weighted
    resampling, with the same reproducibility-by-hash contract as
    :func:`sample_by_hash`: same keys + same weights -> same sample on
    any engine, any partitioning, any day).

    ``weight`` is a per-row Column in [0, 1] (values outside are
    clamped), typically a quality score. A per-row filter: no shuffle,
    pushdown-composable, and nested salts give decorrelated replicates
    for ablations."""
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(
        hash_gate(F.col(key_col), salt)
        < F.floor(w * GATE).cast("long"))


def temperature_keep_rates(df: DataFrame, group_col: str,
                           temperature: float,
                           target_rows: float,
                           counts: dict | None = None) -> dict:
    """Per-group keep probabilities for TEMPERATURE-scaled mixture
    sampling (the multilingual/NMT and pretraining-mixture standard:
    sample group g with probability ∝ n_g^(1/T), so T=1 keeps natural
    proportions and T→∞ flattens toward uniform across groups —
    up-weighting tail domains without hand-tuned weights).

    One tiny aggregation (group counts, k rows to the driver — same
    class as a broadcast; pass ``counts`` to reuse an aggregation the
    caller already ran), then closed-form rates
    ``min(1, target_rows * n_g^(1/T) / Z / n_g)``; feed the dict to
    :func:`mixture_sample`, which realizes it as the deterministic
    hash gate (zero shuffle, rerun-stable, nested). Rates cap at 1 —
    a tail group too small for its temperature share contributes all
    it has (the realized total then lands under ``target_rows``;
    upsampling beyond 1.0 is a different operator). NULL group keys
    are dropped (a NULL domain gets no temperature share — give it a
    real label upstream if it should). Extreme temperatures that
    overflow ``n^(1/T)`` in linear space fall back to log-space
    normalization — same ratios, finite arithmetic (only the linear
    form matches an oracle that mirrors ``pow(n, 1/T)`` literally)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if counts is None:
        counts = {r[0]: r[1] for r in
                  df.groupBy(group_col).count().collect()}
    counts = {g: n for g, n in counts.items() if g is not None}
    if not counts:
        return {}
    groups = sorted(counts)
    try:
        probs = {g: float(counts[g]) ** (1.0 / temperature)
                 for g in groups}
        z = sum(probs[g] for g in groups)
        if z == float("inf"):
            raise OverflowError
    except OverflowError:
        import math
        logs = {g: math.log(counts[g]) / temperature for g in groups}
        m = max(logs.values())
        probs = {g: math.exp(logs[g] - m) for g in groups}
        z = sum(probs[g] for g in groups)
    return {g: min(1.0, target_rows * probs[g] / z / counts[g])
            for g in groups}


def mixture_sample(df: DataFrame, key_col: str, group_col: str,
                   weights: dict[str, float], *, default: float = 0.0,
                   salt: str = "") -> DataFrame:
    """Domain-mixture sampling: per-group keep rates realized as
    deterministic rejection sampling — the "data mixing" step of
    pretraining pipelines (DoReMi/The Pile-style domain reweighting),
    where each source contributes in a tuned proportion rather than its
    natural share.

    ``weights`` maps group value -> keep probability in [0, 1]; groups
    absent from the map get ``default``. Built on
    :func:`importance_sample`, so it inherits the hash-gate contract:
    per-row filter (zero shuffle), engine/partitioning/rerun-stable,
    and nested (a group's 0.25 sample is a subset of its 0.5 sample)."""
    w = F.lit(float(default))
    for g, p in sorted(weights.items()):
        w = F.when(F.col(group_col) == g, F.lit(float(p))).otherwise(w)
    return importance_sample(df, key_col, w, salt=salt)


def plan_mixture(df: DataFrame, total_tokens: int,
                 weights: dict[str, float] | None = None,
                 group_col: str = "source",
                 token_expr: Column | None = None,
                 text_col: str = "text") -> DataFrame:
    """Mixture PLANNER: turn target domain weights + a token budget
    into the per-source sampling rates / epoch counts that
    :func:`mixture_sample` (rate <= 1) or dataset repetition (rate > 1)
    then realize — the "how much of each source do we actually take"
    step between corpus stats and the samplers.

    ``weights`` are renormalized over the sources PRESENT (a target
    mix referencing an absent domain must not silently deflate the
    budget); ``None`` means uniform. Output per source:
    available_tokens, weight, target_tokens, sample_rate
    (target/available — values > 1 mean the source must repeat),
    n_epochs (ceil of rate, the repetition count a packing run needs).

    Scale shape: ONE partial-agg corpus pass to |sources| rows; all
    planning math runs on that k-row relation (the weight-sum join is
    a broadcast of a 1-row aggregate). The plan is data, not state —
    re-running after corpus growth yields the updated rates."""
    tok = token_expr if token_expr is not None \
        else F.size(F.split(F.col(text_col), " ")).cast("bigint")
    per = (df.filter(F.col(group_col).isNotNull())
             .groupBy(group_col)
             .agg(F.sum(tok).alias("available_tokens")))
    if weights is None:
        w = F.lit(1.0)
    else:
        w = F.lit(0.0)
        for g, p in sorted(weights.items()):
            if p < 0:
                raise ValueError(f"negative weight for {g!r}: {p}")
            w = F.when(F.col(group_col) == g, F.lit(float(p))).otherwise(w)
    per = per.withColumn("__w", w)
    tot = per.agg(F.sum("__w").alias("__wsum"))
    target = (F.col("__w") / F.col("__wsum")) * F.lit(float(total_tokens))
    rate = target / F.col("available_tokens")
    return (per.crossJoin(F.broadcast(tot))
               .filter(F.col("__w") > 0)
               .select(group_col, "available_tokens",
                       F.round(F.col("__w") / F.col("__wsum"), 6)
                        .alias("weight"),
                       F.round(target, 2).alias("target_tokens"),
                       F.round(rate, 6).alias("sample_rate"),
                       F.ceil(rate).cast("bigint").alias("n_epochs")))


def epoch_shuffle_ranks(df: DataFrame, seed: int, id_col: str = "doc_id",
                        rank_col: str = "shuffle_rank") -> DataFrame:
    """Deterministic between-epoch corpus shuffle: each row gets a
    dense rank in seeded pseudo-random order (hash(seed:id), id) — the
    "reshuffle the dataset every epoch" step, reproducible across
    reruns and engines and changeable per epoch by bumping ``seed``.

    Built on assign_global_ids, so the order is realized as ONE range
    exchange + per-partition numbering + a tiny offset prefix sum —
    never a single-partition row_number. Writing the corpus
    repartitionByRange(rank_col) then gives shard files in shuffled
    order for sequential training reads."""
    from .partitioning import assign_global_ids

    gate = md5_prefix_int(F.col(id_col).cast("string"),
                          salt=f"epoch{seed}:")
    return assign_global_ids(df.select(id_col), [gate, F.col(id_col)],
                             id_col=rank_col)


def curriculum_interleave(df: DataFrame, group_col: str,
                          order_cols: list[str],
                          rank_col: str = "src_rank",
                          pos_col: str = "pos") -> DataFrame:
    """Curriculum epoch order: rank rows by difficulty WITHIN each group
    (source/domain), then interleave groups — every group's easiest
    examples first, round-robin across groups, so no single domain
    dominates any training window (the "interleaved curriculum" shape
    from data-mixing practice).

    Scale-safe construction: the within-group rank is NOT a per-group
    window (a hot source would serialize onto one core); it's the
    distributed global-rank path ranked by (group, difficulty) minus the
    group's base offset — one range exchange plus a |groups|-row
    broadcast. The final interleave position is a second global rank by
    (rank, group). Deterministic: ties broken by the trailing order
    columns.

    Output: input columns + ``rank_col`` (1-based within group) +
    ``pos_col`` (1-based global curriculum position)."""
    from .partitioning import assign_global_ids

    g = assign_global_ids(df, [group_col] + list(order_cols),
                          id_col="__gpos")
    base = g.groupBy(group_col).agg(F.min("__gpos").alias("__base"))
    ranked = (g.join(F.broadcast(base), group_col)
               .withColumn(rank_col,
                           (F.col("__gpos") - F.col("__base") + 1)
                           .cast("bigint"))
               .drop("__gpos", "__base"))
    out = assign_global_ids(ranked, [rank_col, group_col] + list(order_cols),
                            id_col=pos_col)
    return out.withColumn(pos_col, F.col(pos_col).cast("bigint"))


def epoch_plan(df: DataFrame, group_col: str, token_count: Column | str,
               budget_ratio: float = 2.0, temperature: float = 2.0,
               max_epochs: float = 4.0) -> DataFrame:
    """Multi-epoch token-budget allocation per domain — the pretraining
    recipe step AFTER mixture weights: given a per-domain token count,
    temperature-scaled weights w_g ∝ tokens_g^(1/T), and a total token
    budget (``budget_ratio`` x the corpus), how many PASSES (epochs)
    over each domain does the run make? raw_epochs = budget * w_g /
    tokens_g, capped at ``max_epochs`` (repeating a small domain past
    ~4 epochs measurably degrades models, so the cap is the standard
    guard; capped domains contribute tokens_g * max_epochs and the
    remainder implicitly falls to uncapped domains on renormalization
    — reported here as the uncapped shares so the gap is visible, not
    silently re-spread). Complements :func:`temperature_keep_rates`
    (keep-rates ≤ 1 for DOWN-sampling); this plans UP-sampling
    repeats > 1.

    One partial-aggregable groupBy (k rows of group state); weights
    and epochs are closed-form column expressions over the k-row
    aggregate joined to its 1-row total — no driver round-trip, no
    second scan. Output per domain: tokens, weight, raw_epochs,
    epochs (capped), tokens_contributed, capped flag."""
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    g = (df.groupBy(group_col)
           .agg(F.sum(tc).cast("double").alias("tokens")))
    pr = F.pow(F.col("tokens"), 1.0 / temperature)
    scored = g.withColumn("__pr", pr)
    tot = scored.agg(F.sum("tokens").alias("__total"),
                     F.sum("__pr").alias("__z"))
    out = scored.crossJoin(F.broadcast(tot))
    budget = F.col("__total") * budget_ratio
    raw = budget * F.col("__pr") / F.col("__z") / F.col("tokens")
    capped = F.least(raw, F.lit(float(max_epochs)))
    return (out.select(
        F.col(group_col),
        F.col("tokens"),
        F.round(F.col("__pr") / F.col("__z"), 6).alias("weight"),
        F.round(raw, 6).alias("raw_epochs"),
        F.round(capped, 6).alias("epochs"),
        F.round(capped * F.col("tokens"), 3).alias("tokens_contributed"),
        (raw > max_epochs).alias("capped")))


def doremi_weights(df: DataFrame, group_col: str, loss: Column,
                   token_count: Column | str, eta: float = 1.0,
                   steps: int = 8, smoothing: float = 0.1) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, 'DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining'):
    Group-DRO exponentiated-gradient ascent on per-domain EXCESS loss
    over a reference, starting from the raw token-share prior u:

        a_d  ∝  u_d * exp(eta * steps * excess_d),
        w_d  =  (1 - smoothing) * a_d + smoothing * u_d,

    with excess_d = max(loss_d - loss_ref, 0), loss_d the per-domain
    mean of ``loss`` (a per-row proxy-model loss column — here the
    quality-score deficit stands in for the proxy LM's loss) and
    loss_ref the corpus mean. In training, DoReMi re-evaluates the
    excess each step against a live proxy model; with a FIXED proxy
    loss column the T-step EG recursion is a product of identical
    multiplicative updates and collapses to the closed form above —
    computed that way deliberately (the live inner loop is a training
    concern; the data plan needs the fixed-point mixture), which also
    makes the weights exactly oracle-reproducible.

    Plan shape: ONE partial-aggregable groupBy to k domain rows
    carrying (token sum, loss sum, row count); the reference loss
    derives from the SAME k-row aggregate (sum of sums — no second
    corpus scan), and the softmax normalizer is a 1-row agg over the
    k rows, broadcast back. Per-domain means and excesses are rounded
    to 6 before exp() so both engines exponentiate identical inputs.
    Output per domain: tokens, token_share (= u), loss, excess,
    doremi_alpha (pre-smoothing), doremi_weight."""
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    g = (df.groupBy(group_col)
           .agg(F.sum(tc).cast("double").alias("tokens"),
                F.sum(loss).alias("__ls"),
                F.count(F.lit(1)).alias("__n"))
           .localCheckpoint(eager=False))  # feeds totals AND scoring
    tot = g.agg(F.sum("tokens").alias("__tt"),
                F.sum("__ls").alias("__lst"), F.sum("__n").alias("__nt"))
    base = g.crossJoin(F.broadcast(tot))
    loss_d = F.round(F.col("__ls") / F.col("__n"), 6)
    loss_ref = F.round(F.col("__lst") / F.col("__nt"), 6)
    excess = F.round(F.greatest(loss_d - loss_ref, F.lit(0.0)), 6)
    u = F.col("tokens") / F.col("__tt")
    score = u * F.exp(F.lit(float(eta) * int(steps)) * excess)
    scored = (base.withColumn("__u", u).withColumn("__loss", loss_d)
                  .withColumn("__ex", excess).withColumn("__s", score)
                  .localCheckpoint(eager=False))
    z = scored.agg(F.sum("__s").alias("__z"))
    alpha = F.col("__s") / F.col("__z")
    w = ((1.0 - float(smoothing)) * alpha
         + float(smoothing) * F.col("__u"))
    return (scored.crossJoin(F.broadcast(z))
                  .select(F.col(group_col), F.col("tokens"),
                          F.round("__u", 6).alias("token_share"),
                          F.col("__loss").alias("loss"),
                          F.col("__ex").alias("excess"),
                          F.round(alpha, 6).alias("doremi_alpha"),
                          F.round(w, 6).alias("doremi_weight")))


def length_buckets(df: DataFrame, token_count: Column | str,
                   n_buckets: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Length-bucketed batch planning (the `group_by_length` /
    bucketed-batching recipe): rank every document by token count,
    cut the ranking into ``n_buckets`` equal-population buckets, and
    report per bucket the padding waste a pad-to-longest batcher
    would spend — ``n_docs * max_tokens - sum_tokens`` — versus the
    one-bucket baseline where everything pads to the corpus max.
    Sequence packing (:func:`pack_sequences`) eliminates padding by
    concatenation; this PLANS the cheaper alternative when example
    boundaries must survive (SFT, contrastive pairs), and its output
    is the bucket boundary table a loader shards by.

    The global rank deliberately avoids ``row_number() OVER (ORDER BY
    ...)`` — an unpartitioned window serializes the corpus through one
    task — and uses :func:`~.partitioning.assign_global_ids` instead:
    one range exchange, per-partition numbering in parallel, O(tasks)
    driver ints. bucket = floor((rank-1) * k / N) needs N, a 1-row
    broadcast count off the numbered frame; then one k-row groupBy.
    Ties rank by (token_count, id) so bucket membership is total-order
    deterministic on both engines.

    The narrow (id, token_count) projection is localCheckpoint'd
    BEFORE the range exchange: RangePartitioner's boundary-sampling
    job evaluates its child, so an un-materialized projection whose
    expression is expensive (split the full text to count tokens)
    gets computed twice — measured at the 100x fixture as 14.9 s vs
    1.0 s with the two-longs-per-row materialization."""
    from .partitioning import assign_global_ids
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    k = int(n_buckets)
    lens = (df.select(F.col(id_col), tc.cast("long").alias("__tok"))
              .localCheckpoint(eager=False))
    ranked = assign_global_ids(lens, ["__tok", id_col], id_col="__rk")
    n = ranked.agg(F.count(F.lit(1)).alias("__N"))
    bucket = F.floor((F.col("__rk") - 1) * k / F.col("__N")).cast("int")
    return (ranked.crossJoin(F.broadcast(n))
                  .groupBy(bucket.alias("bucket"))
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.min("__tok").alias("min_tokens"),
                       F.max("__tok").alias("max_tokens"),
                       F.sum("__tok").alias("sum_tokens"))
                  .select("bucket", "n_docs", "min_tokens", "max_tokens",
                          "sum_tokens",
                          (F.col("n_docs") * F.col("max_tokens")
                           - F.col("sum_tokens")).alias("pad_waste"),
                          F.round((F.col("n_docs") * F.col("max_tokens")
                                   - F.col("sum_tokens"))
                                  / (F.col("n_docs")
                                     * F.col("max_tokens")), 6)
                           .alias("waste_frac")))


def score_rank_by_group(df: DataFrame, group_col: str, score: Column,
                        id_col: str = "doc_id",
                        keep_above: float = 0.5) -> DataFrame:
    """Per-group calibrated score ranking — the fair-filtering recipe:
    a single global threshold on a quality score filters domains
    unevenly (a boilerplate-heavy domain loses everything, a clean one
    nothing), so production pipelines threshold on the WITHIN-domain
    percent rank instead, keeping the same top fraction of every
    domain. Output per row: the score, its exact percent rank inside
    the group (0 = worst, 1 = best; SQL percent_rank convention,
    ties broken by id so both engines rank identically), and a keep
    flag at ``rank_pct >= keep_above``.

    Same plan as prototypicality_prune's rank path: NO
    Window.partitionBy(group) — few groups would serialize the corpus
    through n_groups tasks — ranks derive from
    :func:`~.partitioning.assign_global_ids` over (group, score, id)
    (one range exchange, parallel per-partition numbering) with
    per-group offsets a broadcast aggregate. The scored 3-column frame
    is localCheckpoint'd BEFORE the range exchange (the
    RangePartitioner double-evaluation lesson: the score expression is
    a regex/array pipeline you do not want computed twice)."""
    from .partitioning import assign_global_ids
    scored = (df.select(F.col(id_col), F.col(group_col),
                        score.alias("__s"))
                .localCheckpoint(eager=False))
    ranked = assign_global_ids(scored, [group_col, "__s", id_col],
                               id_col="__gr")
    stats = (ranked.groupBy(group_col)
                   .agg(F.min("__gr").alias("__r0"),
                        F.count(F.lit(1)).alias("__n")))
    rank_in = F.col("__gr") - F.col("__r0") + 1
    pct = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        (rank_in - 1).cast("double") / (F.col("__n") - 1))
    return (ranked.join(F.broadcast(stats), group_col)
                  .select(F.col(id_col), F.col(group_col),
                          F.col("__s").alias("score"),
                          F.round(pct, 6).alias("rank_pct"),
                          (F.round(pct, 6) >= float(keep_above))
                          .alias("keep")))


def epoch_plan_from_weights(domains: DataFrame, group_col: str,
                            tokens_col: str = "tokens",
                            weight_col: str = "weight",
                            budget_ratio: float = 2.0,
                            max_epochs: float = 4.0) -> DataFrame:
    """Epoch allocation from PRECOMPUTED mixture weights — the second
    half of :func:`epoch_plan` factored out so any weight source
    composes: temperature weights, :func:`doremi_weights` output, a
    hand-tuned table. Input is the k-row domain frame (group, token
    count, weight summing to ~1); output mirrors :func:`epoch_plan`:
    raw_epochs = budget * w / tokens, capped at ``max_epochs`` with
    the capped gap reported, tokens_contributed = epochs * tokens.

    Everything is closed-form column math over the k rows x their
    broadcast 1-row token total — no corpus scan at all (the weight
    producer already paid it), which is the point of the composition:
    re-planning a 100 TB run under new weights costs k rows."""
    tot = domains.agg(F.sum(tokens_col).alias("__total"))
    out = domains.crossJoin(F.broadcast(tot))
    raw = (F.col("__total") * budget_ratio * F.col(weight_col)
           / F.col(tokens_col))
    capped = F.least(raw, F.lit(float(max_epochs)))
    return out.select(
        F.col(group_col), F.col(tokens_col).alias("tokens"),
        F.col(weight_col).alias("weight"),
        F.round(raw, 6).alias("raw_epochs"),
        F.round(capped, 6).alias("epochs"),
        F.round(capped * F.col(tokens_col), 3).alias("tokens_contributed"),
        (raw > max_epochs).alias("capped"))


def unimax_epochs(df: DataFrame, group_col: str,
                  token_count: Column | str,
                  budget_ratio: float = 2.0,
                  max_epochs: float = 4.0) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, 'UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining'): spread the token budget as UNIFORMLY as possible
    across domains subject to a per-domain epoch cap — the fairness-
    principled alternative to temperature sampling (which still
    over-allocates to head domains) and the third member of the
    mixing-recipe family here (temperature_keep_rates / epoch_plan,
    doremi_weights).

    Exact water-filling, closed-form over the k-row domain aggregate:
    sort domains by capacity cap_d = tokens_d * max_epochs ascending;
    the saturation prefix is every rank i whose capacity fits under
    the then-uniform share, cap_i <= (B - cumcap_{i-1}) / (k - i + 1)
    (B = budget_ratio x corpus tokens); saturated domains take their
    full capacity, the rest split the remainder evenly. Computed with
    rank/cumsum windows over the k-row aggregate — an unpartitioned
    WindowExec on purpose and safely: the windowed relation is k
    domain rows (the one-task ceiling is k ~ thousands, not the
    corpus; the corpus-sized work is the ONE partial-aggregable
    groupBy producing the k rows). All comparisons are exact integer-
    valued doubles, so the saturation prefix is engine-independent.

    Output per domain: tokens, capacity, saturated flag, uniform
    share at its rank, alloc_tokens, epochs = alloc/tokens."""
    from pyspark.sql import Window
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    g = (df.groupBy(group_col)
           .agg(F.sum(tc).cast("double").alias("tokens"))
           .withColumn("__cap", F.col("tokens") * float(max_epochs)))
    w = Window.orderBy("__cap", group_col)
    tot = g.agg(F.sum("tokens").alias("__tt"),
                F.count(F.lit(1)).alias("__k"))
    ranked = (g.withColumn("__i", F.row_number().over(w))
               .withColumn("__pre", F.coalesce(
                   F.sum("__cap").over(
                       w.rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0.0)))
               .crossJoin(F.broadcast(tot)))
    budget = F.col("__tt") * float(budget_ratio)
    share_at = (budget - F.col("__pre")) / (F.col("__k") - F.col("__i") + 1)
    sat = F.col("__cap") <= share_at
    # leftover uniform share: computed from the FULL saturated prefix
    # (max saturated rank + its cumulative capacity), broadcast back
    pref = (ranked.filter(sat)
                  .agg(F.max("__i").alias("__m"),
                       F.sum("__cap").alias("__scap")))
    out = (ranked.crossJoin(F.broadcast(pref))
                 .withColumn("__m", F.coalesce(F.col("__m"), F.lit(0)))
                 .withColumn("__scap", F.coalesce(F.col("__scap"),
                                                  F.lit(0.0))))
    rest = F.when(F.col("__k") > F.col("__m"),
                  (budget - F.col("__scap"))
                  / (F.col("__k") - F.col("__m"))).otherwise(F.lit(0.0))
    alloc = F.when(F.col("__i") <= F.col("__m"),
                   F.col("__cap")).otherwise(rest)
    return out.select(
        F.col(group_col), F.col("tokens"),
        F.col("__cap").alias("capacity"),
        (F.col("__i") <= F.col("__m")).alias("saturated"),
        F.round(share_at, 3).alias("share_at_rank"),
        F.round(alloc, 3).alias("alloc_tokens"),
        F.round(alloc / F.col("tokens"), 6).alias("epochs"))
