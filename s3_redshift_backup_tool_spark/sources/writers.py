"""JDBC warehouse sink: append / truncate-replace / staged-MERGE upsert.

The reference's load plane is S3 COPY into Redshift plus a staged-table
merge for upserts (gemini_redshift_loader.py:377-543). The generic-
warehouse equivalent on Spark is:

- data movement: ``df.write.jdbc`` — executor-parallel batched INSERTs,
  one connection per partition (``numPartitions`` bounds warehouse
  connection fan-in; ``batchsize`` amortizes round-trips);
- transactional swap: driver-side SQL on the target connection
  (TRUNCATE for replace, MERGE from a staged table for upsert) — the
  same shape as Redshift's COPY-to-staging + MERGE idiom, where the
  heavy lifting stays set-based inside the warehouse.

Exercised live against embedded Derby in ``tests/test_jdbc.py`` (the
same code path any JDBC URL takes). Production Redshift swap:
spark-redshift connector (COPY from the parquet staging dir written by
``plans/sync.py``) — plan shapes unchanged, only this module's calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def execute_sql(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL/DML statements on the target over one driver-side
    connection (metadata-sized work only — never row data)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


def jdbc_count(spark: SparkSession, url: str, table: str) -> int:
    """A7-style row-count verification against the live target."""
    df = spark.read.format("jdbc").options(
        url=url, query=f"SELECT COUNT(*) AS n FROM {table}").load()
    # positional: dialects differ on identifier casing (Derby -> "N")
    return int(df.collect()[0][0])


def load_jdbc_append(df: DataFrame, url: str, table: str, *,
                     batchsize: int = 10_000,
                     num_partitions: int | None = None) -> None:
    """K2 append load: executor-parallel batched INSERTs. At warehouse
    scale cap ``num_partitions`` — every partition is one connection,
    and a 1000-executor job must not open 1000 warehouse sessions."""
    w = df
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
        w = df.coalesce(num_partitions)
    (w.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchsize)
      .mode("append").save())


def load_jdbc_replace(df: DataFrame, url: str, table: str, *,
                      batchsize: int = 10_000) -> None:
    """K3 truncate-then-load: ``truncate=true`` keeps the table's DDL
    (grants, sort/dist keys on a real warehouse) instead of drop+create."""
    (df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchsize)
      .option("truncate", "true")
      .mode("overwrite").save())


def load_jdbc_upsert(spark: SparkSession, df: DataFrame, url: str,
                     table: str, key_cols: list[str], *,
                     batchsize: int = 10_000) -> None:
    """Staged-table MERGE upsert (the reference's Redshift idiom,
    gemini_redshift_loader.py staged COPY + merge): the delta lands in
    ``<table>__STAGE`` via parallel JDBC write, then ONE set-based MERGE
    runs inside the warehouse — no per-row driver round-trips, and the
    swap is transactional on the target side. Stage is dropped after.

    Requires the target table to exist (create it with an initial
    append/replace load)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    cols = df.columns
    non_keys = [c for c in cols if c not in key_cols]
    stage = f"{table}__STAGE"
    (df.write.format("jdbc")
       .option("url", url).option("dbtable", stage)
       .option("batchsize", batchsize)
       .mode("overwrite").save())
    # Spark's JDBC writer creates columns as QUOTED identifiers (exact
    # case); the merge must quote them too or the dialect upper-cases
    def _q(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    set_clause = ", ".join(f"{_q(c)} = s.{_q(c)}" for c in non_keys)
    insert_cols = ", ".join(_q(c) for c in cols)
    insert_vals = ", ".join(f"s.{_q(c)}" for c in cols)
    matched = f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_keys else ""
    execute_sql(
        spark, url,
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})",
        f"DROP TABLE {stage}")


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink, mirroring the parquet staging writer's layout options
    (plans/sync.py): same partition-directory scheme, so a downstream
    Hive-era consumer can point at the staging root unchanged."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
