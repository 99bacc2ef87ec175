"""Audit oracle SQL for driver-hash-unsafe column typing.

Round-8 post-mortem (VERDICT r8 "What's wrong" #1): the driver's hash
canonicalization is type-sensitive even when values are equal, and a bare
decimal literal like ``CASE ... THEN 4.0`` types the derived column
DECIMAL in DuckDB while the Spark side emits DOUBLE — rows+schema green,
hash red. tools/check_parity.py compares numerically so it cannot catch
this class; this audit catches it structurally:

  for every registry oracle, bind it in DuckDB (sf0.01 views; binding
  only, no execution) to get column types, take the Spark plan's schema
  lazily (no job), and flag any column whose oracle type is DECIMAL
  while Spark's is float/double — or any other numeric-family mismatch
  (int vs float) that would survive a value-equality check but change
  the hash input.

Usage: python tools/oracle_type_audit.py [sf_dir]
Exit 1 if any entry is flagged.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_redshift_backup_tool_spark.parity import REGISTRY  # noqa: E402
import s3_redshift_backup_tool_spark.parity_ext  # noqa: E402,F401
from s3_redshift_backup_tool_spark.session import get_spark  # noqa: E402
from s3_redshift_backup_tool_spark.sources.readers import TPCH_TABLES  # noqa: E402


def family(type_name: str) -> str:
    t = type_name.upper()
    # Families are keyed by what the value becomes AFTER the pandas
    # conversion the driver applies (duckdb fetchdf / spark toPandas):
    # DECIMAL -> float64 (hashes like a double: safe vs spark double),
    # HUGEINT -> float64 (hashes "1407.0" vs spark int64's "1407": RED —
    # this, not DECIMAL, was the actual r8 mixture_plan_by_source
    # failure; sum(BIGINT) promotes to HUGEINT in DuckDB).
    if "HUGEINT" in t:
        return "hugeint"
    if "DECIMAL" in t or "NUMERIC" in t:
        return "decimal"
    if any(k in t for k in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "INT", "LONG", "SHORT", "BYTE")):
        return "int"
    if "BOOL" in t:
        return "bool"
    if any(k in t for k in ("VARCHAR", "STRING", "CHAR", "TEXT")):
        return "string"
    if "TIMESTAMP" in t:
        return "timestamp"
    if "DATE" in t:
        return "date"
    if any(k in t for k in ("LIST", "ARRAY")):
        return "array"
    if any(k in t for k in ("STRUCT", "MAP", "ROW")):
        return "nested"
    if any(k in t for k in ("BLOB", "BINARY")):
        return "binary"
    return t.lower()


# Pairings the driver hash tolerates (empirically, from green driver
# rows in CORRECTNESS_r01..r08): int widths canonicalize; DECIMAL
# fetches as float64 so it hashes like a double
# (classifier_pr_curve_documents green r7); DATE vs spark timestamp
# canonicalizes to the same datetime repr (cohort_retention_weekly
# green r8, tumbling_daily/distinct_users_daily green r1-7).
# HUGEINT vs int is deliberately ABSENT: it fetches as float64 and
# hash-reds against spark int64 (mixture_plan_by_source, r8).
SAFE = {("int", "int"), ("float", "float"), ("bool", "bool"),
        ("string", "string"), ("timestamp", "timestamp"), ("date", "date"),
        ("array", "array"), ("nested", "nested"), ("binary", "binary"),
        ("decimal", "float"), ("date", "timestamp"),
        ("hugeint", "float"),
        }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("type_audit", cpus=4, shuffle_partitions=4)

    flagged = 0
    checked = 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            rel = con.sql(spec.oracle)
            otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001
            print(f"  X {name}: oracle bind failed: {str(e)[:200]}")
            flagged += 1
            continue
        try:
            sschema = {f.name: f.dataType.simpleString()
                       for f in spec.fn(spark, sf_dir).schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"  X {name}: spark plan failed: {str(e)[:200]}")
            flagged += 1
            continue
        checked += 1
        probs = []
        for col, ot in otypes.items():
            if col not in sschema:
                probs.append(f"{col}: oracle-only column")
                continue
            of, sf = family(ot), family(sschema[col])
            if of == sf or (of, sf) in SAFE:
                continue
            probs.append(f"{col}: oracle {ot} ({of}) vs spark "
                         f"{sschema[col]} ({sf})")
        for col in sschema:
            if col not in otypes:
                probs.append(f"{col}: spark-only column")
        if probs:
            flagged += 1
            print(f"  ! {name}: " + "; ".join(probs))
    print(f"\n{checked} checked, {flagged} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
