"""Local replica of the driver's correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, column-name set, and
order-insensitive values (rows sorted by all columns). Floats compared to
1e-9 relative; everything else exact.

Usage: python tools/check_parity.py [--vanilla] [sf_dir] [name_filter...]

``--vanilla`` runs the sweep under a DEFAULT SparkSession — none of
session.py's confs (no UTC pin, no inferTimestampNTZ=false, no Python
filterPushdown, no arrow flag, Spark-default shuffle partitions). This is
the driver-environment lint: twice (r3 complex-typed window columns, r9
``spark.sql.python.filterPushdown.enabled``) a query was builder-green
but driver-red because it silently depended on a builder-session conf.
Every rotation window must be pre-verified under --vanilla as well as
the tuned session; tests/test_vanilla_session.py runs this in CI as a
subprocess so the JVM carries no builder confs at all.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_redshift_backup_tool_spark.parity import REGISTRY  # noqa: E402
import s3_redshift_backup_tool_spark.parity_ext  # noqa: E402,F401  (extends REGISTRY)
from s3_redshift_backup_tool_spark.session import get_spark  # noqa: E402
from s3_redshift_backup_tool_spark.sources.readers import TPCH_TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            b = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            ok = np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            exact = np.array_equal(a, b, equal_nan=True)
            if not ok:
                i = int(np.argmax(~np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)))
                problems.append(f"col {c}: value mismatch at {i}: {a[i]} vs {b[i]}")
            elif not exact:
                problems.append(f"col {c}: WARN float not bit-exact (within 1e-9)")
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                neq = (sv.astype(str) != ov.astype(str))
                i = int(neq.idxmax())
                problems.append(f"col {c}: value mismatch at {i}: {sv[i]!r} vs {ov[i]!r}")
    return problems


def vanilla_spark():
    """A default-conf SparkSession: only harness resources (master, UI,
    driver memory) are set — every SQL-semantic conf is Spark's 4.1
    default, exactly what a driver that builds its own session gets."""
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master("local[8]")
            .appName("parity-vanilla")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .getOrCreate())


def main():
    args = [a for a in sys.argv[1:] if a not in ("--vanilla", "--window")]
    vanilla = "--vanilla" in sys.argv[1:]
    window_only = "--window" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.01"
    filters = [a for a in args if not os.path.isdir(a)]

    spark = vanilla_spark() if vanilla \
        else get_spark("parity", cpus=8, shuffle_partitions=8)
    if vanilla:
        spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # slice by the rotation window's actual size, not a literal 50 — a
    # future rotation with a different window size would otherwise lint
    # the wrong query set
    from s3_redshift_backup_tool_spark.parity_ext import _WINDOW
    names = list(REGISTRY)[:len(_WINDOW)] if window_only else list(REGISTRY)
    n_pass = n_fail = n_rows_only = 0

    def conf_snapshot() -> dict[str, str]:
        return {r["key"]: r["value"]
                for r in spark.sql("SET").collect()}

    baseline_conf = conf_snapshot()

    def restore_conf() -> None:
        # Per-query session-conf isolation: a query that sets a runtime
        # SQLConf (python_source_cdc_feed must leave
        # spark.sql.python.filterPushdown.enabled on through its own
        # action) must not silently change the environment a LATER query
        # is linted under — that would mask exactly the
        # driver-runs-it-in-isolation failure class this sweep exists to
        # catch. Reset any drifted keys after each query's action.
        for k, v in conf_snapshot().items():
            if k not in baseline_conf:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            elif baseline_conf[k] != v:
                try:
                    spark.conf.set(k, baseline_conf[k])
                except Exception:
                    pass

    for name in names:
        spec = REGISTRY[name]
        if filters and not any(f in name for f in filters):
            continue
        try:
            try:
                sdf = spec.fn(spark, sf_dir).toPandas()
            finally:
                restore_conf()
            if spec.oracle is None:
                n_rows_only += 1
                print(f"  ~ {name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(spec.oracle).fetchdf()
            problems = compare(sdf, odf)
            hard = [p for p in problems if "WARN" not in p]
            if hard:
                n_fail += 1
                print(f"  X {name}: " + "; ".join(problems))
            else:
                n_pass += 1
                warn = "; ".join(p for p in problems if "WARN" in p)
                print(f"  . {name}: OK ({len(sdf)} rows)" + (f" [{warn}]" if warn else ""))
        except Exception as e:
            n_fail += 1
            print(f"  X {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
