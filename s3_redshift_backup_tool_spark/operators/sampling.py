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
