"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental-sync slice (hybrid keyset
CDC filter + schema alignment on orders, SURVEY §7.1 step 1) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full parity registry
(s3_redshift_backup_tool_spark/parity.py + parity_ext.py): every operator
from SURVEY §2 plus the LLM-data-pipeline extensions, every
one with a DuckDB oracle (zero rows-only entries); the live count is
``len(queries())``. The registry is
ordered so each unique operator family sits inside the driver's checked
window; the tail holds variants whose code paths an in-window sibling
already exercises (see parity_ext._WINDOW/_TAIL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from s3_redshift_backup_tool_spark.parity import REGISTRY
import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401  (extends REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid-keyset CDC delta of orders, aligned to the target
    schema (the minimum end-to-end slice from SURVEY §7.1)."""
    from pyspark.sql import types as T

    from s3_redshift_backup_tool_spark.operators.align import align_to_schema
    from s3_redshift_backup_tool_spark.operators.cdc import (
        CDCConfig, Watermark, apply_cdc)
    from s3_redshift_backup_tool_spark.sources.readers import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    cfg = CDCConfig(strategy="hybrid", timestamp_column="o_orderdate",
                    id_column="o_orderkey")
    delta = apply_cdc(orders, cfg,
                      Watermark(last_timestamp="1998-01-01 00:00:00", last_id=500))
    target = T.StructType([
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ])
    return align_to_schema(delta, target)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions)."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only entries omitted."""
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
