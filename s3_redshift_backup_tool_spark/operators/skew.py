"""Skew mitigation: salted joins.

AQE's skew-join split handles sort-merge skew at runtime, but a
broadcast-infeasible join against a *hot key* (one key holding 10% of
100 TB) still bottlenecks a single task per key. Salting splits each hot
key into ``num_salts`` synthetic sub-keys: the big side scatters rows
across salts, the small side replicates each row to every salt, and the
join key becomes (key, salt) — the hot key's rows now land on
``num_salts`` tasks.

Cost model: small side grows x num_salts (shuffle + memory), big side
unchanged. Use for the handful of keys a frequency probe flags, not the
whole join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salt_big_side(df: DataFrame, num_salts: int,
                  scatter_col: str | None = None) -> DataFrame:
    """Scatter rows across ``num_salts`` sub-keys. Deterministic when a
    ``scatter_col`` (any high-cardinality column) is given — hashed into
    a salt; otherwise a seeded uniform random salt."""
    if scatter_col is not None:
        salt = F.pmod(F.xxhash64(F.col(scatter_col)), F.lit(num_salts))
    else:
        salt = (F.rand(seed=42) * num_salts).cast("int")
    return df.withColumn(SALT, salt.cast("int"))


def explode_small_side(df: DataFrame, num_salts: int) -> DataFrame:
    """Replicate each row to every salt value (the broadcast-like
    expansion that makes (key, salt) a complete join key)."""
    return (df.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
              .withColumn(SALT, F.col(SALT).cast("int")))


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                num_salts: int = 8, how: str = "inner",
                scatter_col: str | None = None) -> DataFrame:
    """Join ``big`` with ``small`` on ``on`` + synthetic salt.

    Semantically identical to ``big.join(small, on, how)`` for inner and
    left joins (every big row keeps exactly one salt; every small row
    exists at every salt)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = salt_big_side(big, num_salts, scatter_col)
    s = explode_small_side(small, num_salts)
    return b.join(s, keys + [SALT], how).drop(SALT)
