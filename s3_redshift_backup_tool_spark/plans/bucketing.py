"""Bucketed-table layout: the co-located join SCALE.md keeps promising.

SCALE.md's 100 TB arguments repeatedly say "bucket both snapshot/fact
tables by key and the join is co-partitioned". This module makes that
executable: write a relation as a BUCKETED table (Spark native bucketing
— hash(key) % n_buckets per output file, recorded in the session
catalog; no Hive metastore needed), and a join between two tables
bucketed on the same key with the same bucket count compiles WITH ZERO
shuffle exchanges — each task sort-merges bucket i of A against bucket i
of B directly off the scans. At 100 TB that deletes the two largest
exchanges in any recurring fact-fact join (e.g. snapshot_diff's
full-outer join of consecutive snapshots, or orders x lineitem every
run): you pay one bucketed write per snapshot and never shuffle either
side again.

Reference parity note: the reference has no join engine at all, so this
is engine capability beyond parity — cited from the Spark SQL public
docs (DataFrameWriter.bucketBy; SPARK-12394 bucketing design).

The zero-exchange claim is PLAN-PINNED in tests/test_bucketing.py, not
asserted in prose: the executed plan of the bucketed join contains a
SortMergeJoin and no Exchange node, and equals the plain join
row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str] | str,
                   n_buckets: int, sort_cols: list[str] | str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed by ``keys`` into
    ``n_buckets`` (optionally sorted within buckets, which additionally
    removes the per-task Sort under a sort-merge join). Bucket count is
    a layout contract: BOTH sides of a co-located join must use the
    same ``n_buckets`` and key order."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if mode == "overwrite":
        # the session catalog is in-memory: a table written by a PREVIOUS
        # session is gone from the catalog but its warehouse directory
        # survives, and saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS. Overwrite means overwrite: drop the
        # catalog entry AND the orphaned location.
        import shutil
        from urllib.parse import urlparse
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # Orphaned-location cleanup must mirror Spark's actual layout:
        # default-db tables live at <wh>/<tbl>, but a table in database
        # db lives at <wh>/db.db/<tbl>. Resolve the database (current
        # database when the name is unqualified) instead of always
        # stripping to the bare table name, which both missed qualified
        # locations and could delete a same-named table's directory
        # from another database.
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        db, _, tbl = table.rpartition(".")
        db = db or spark.catalog.currentDatabase()
        loc = (f"{wh.rstrip('/')}/{tbl}" if db == "default"
               else f"{wh.rstrip('/')}/{db}.db/{tbl}")
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) \
            else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. The
    plan this produces is the point: scans report the bucket layout and
    Catalyst elides both shuffle exchanges (verify with
    ``count_exchanges``)."""
    on = [on] if isinstance(on, str) else list(on)
    # hint the sort-merge path explicitly: co-location is a SMJ/shuffle
    # economics story; at toy scales the planner would otherwise
    # broadcast the small side and mark the bucketing unused
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table).hint("merge"), on, how))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the formatted physical plan
    (BroadcastExchange excluded — broadcasts are not shuffles)."""
    txt = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    return sum(1 for line in txt.splitlines()
               if "Exchange" in line and "BroadcastExchange" not in line
               and line.lstrip().startswith(("(", "*", "+", ":")))
