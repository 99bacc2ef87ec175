"""Processed-file manifest operators: the idempotency layer.

The reference tracks every S3 parquet file it has COPY'd into Redshift in a
``processed_files`` blacklist inside the watermark and set-subtracts it from
each discovery listing (gemini_redshift_loader.py:499-527,
simple_watermark_manager.py:186-229). Here the same semantics are DataFrame
set operations:

- exclusion  = ``left_anti`` join (P5) — scales to millions of manifest
  entries where the reference's in-memory set would not; a broadcast hint
  keeps it shuffle-free while the manifest is small.
- union-dedup = ``union().distinct()`` (U1)
- difference  = ``left_anti`` (U2)

For data-level idempotency (not just file-level) we add
``exclude_processed_rows``: filter on ``input_file_name()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def files_df(spark: SparkSession, paths: list[str], col: str = "path") -> DataFrame:
    return spark.createDataFrame([(p,) for p in paths], f"{col} string")


def exclude_processed(discovered: DataFrame, processed: DataFrame,
                      on: str = "path") -> DataFrame:
    """P5: discovered files minus blacklist (reference :499-527).

    ``broadcast`` on the manifest side: it is tiny relative to the
    discovery listing, so the anti-join is map-side and shuffle-free."""
    return discovered.join(F.broadcast(processed.select(on).distinct()),
                           on=on, how="left_anti")


def union_dedup(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1: blacklist union with set-dedup (reference
    simple_watermark_manager.py:205-208)."""
    return a.unionByName(b).distinct()


def set_difference(a: DataFrame, b: DataFrame, on: str) -> DataFrame:
    """U2: a - b on key (reference discovered-minus-processed)."""
    return a.join(b.select(on).distinct(), on=on, how="left_anti")


def exclude_processed_rows(df: DataFrame, processed_paths: list[str]) -> DataFrame:
    """Row-level idempotent read: drop rows originating from already-loaded
    files, resolved at scan time via ``input_file_name()``."""
    if not processed_paths:
        return df
    return df.filter(~F.input_file_name().isin(processed_paths))


def discover_parquet_files(spark: SparkSession, path: str) -> DataFrame:
    """S14 file discovery (reference :377-543 paginated list_objects_v2) —
    one distributed metadata read; newest-first trim (O4) is an orderBy."""
    df = spark.read.parquet(path)
    return (df.select(F.input_file_name().alias("path"))
              .distinct())


def norm_file_col(col: F.Column) -> F.Column:
    """Normalize ``input_file_name()`` URIs to plain paths so they join
    against driver-listed paths (local scheme only; S3 keys pass through)."""
    return F.regexp_replace(col, "^file:(//)?", "")


class ParquetManifest:
    """Processed-file manifest as a parquet table — the 100 TB replacement
    for the reference's JSON-array blacklist inside the watermark document
    (simple_watermark_manager.py:186-249).

    At millions of staged files the JSON doc and its driver-side set both
    explode; here membership is an anti-join against a parquet table and
    recording is an append of a path DataFrame — no path list is ever
    collect()ed to the driver. The v2.0 watermark doc keeps only counts
    (metadata), not the file array. Stored under a ``_``-prefixed
    directory so data reads of the staging root never see it."""

    SCHEMA = "path string, loaded_at timestamp"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        # Hadoop FileSystem API, not local glob — the manifest may live on
        # an object store (s3a://...) where os/glob would always say
        # "absent" and every staged file would silently reload. Recursive
        # listFiles, because only an actual data file proves the manifest
        # holds entries: a directory containing nothing but empty subdirs
        # or marker files would otherwise send paths_df into a
        # schema-inference failure (round-3 advisor finding).
        jvm = self.spark._jvm
        jsc = self.spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return False
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False

    def paths_df(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], self.SCHEMA).select("path")
        return self.spark.read.schema(self.SCHEMA).parquet(self.path) \
            .select("path")

    def record(self, files: DataFrame) -> None:
        """Append newly loaded paths (a ``path``-column DataFrame). Dedup
        against existing entries stays an anti-join; the append itself is
        a distributed write. No broadcast hint — at the millions-of-files
        scale this class exists for, forcing the whole manifest to the
        driver per append is the exact bottleneck it removes; AQE picks
        broadcast while small and degrades to a shuffled anti-join."""
        new = files.select("path").distinct() \
            .join(self.paths_df(), "path", "left_anti") \
            .withColumn("loaded_at", F.current_timestamp())
        new.write.mode("append").parquet(self.path)

    def exclude_loaded(self, discovered: DataFrame, on: str = "path") -> DataFrame:
        """P5 blacklist exclusion at manifest scale: plain left_anti; no
        broadcast hint — AQE picks broadcast while the manifest is small
        and degrades to a shuffled anti-join when it is not."""
        return discovered.join(self.paths_df().withColumnRenamed("path", on)
                               .distinct(), on=on, how="left_anti")

    def count(self) -> int:
        return self.paths_df().count()
