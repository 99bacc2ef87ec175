"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``):
a deterministic CDC-changefeed simulator with partitioned parallel
reads and id-range filter pushdown.

Why it exists: the reference's sources are a MySQL cursor and S3 files;
Spark 4's Python Data Source API is the idiomatic way to graft any
OTHER feed (an internal changelog service, a paginated HTTP API, a
message-queue snapshot) into the same DataFrame plans this repo builds
— without JVM code. This module is the worked example of that seam,
shaped like a CDC binlog:

- ``spark.read.format("cdc_feed").option("end", N)`` yields rows
  ``(id, ts, op, value)`` — inserts/updates/deletes in a deterministic
  cycle, timestamps monotone in id — so every CDC operator in
  ``operators/cdc.py`` composes with it unchanged.
- ``partitions()`` splits the id range into ``numPartitions`` input
  splits -> executor-parallel generation (the Python-source analogue of
  the JDBC partitioned read, §2.10).
- ``pushFilters()`` absorbs id-range comparisons (>) (>=) (<) (<=) (=)
  by NARROWING the generated range — the watermark predicate of an
  id_only/hybrid CDC scan therefore prunes work at the SOURCE, exactly
  like PushedFilters on parquet/JDBC. Unsupported filters are returned
  to Spark for post-scan evaluation, per the API contract.

Determinism contract (tested): same options -> same rows, any
partitioning, any engine; value is a pure function of id so the DuckDB
oracle can reproduce the feed.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    EqualTo, Filter, GreaterThan,
                                    GreaterThanOrEqual, InputPartition,
                                    LessThan, LessThanOrEqual)

#: feed epoch: ts = EPOCH + id seconds (naive UTC, matching the parquet
#: fixtures' session-timezone handling)
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_OPS = ("I", "I", "I", "I", "I", "I", "I", "I", "U", "D")  # 80/10/10


def feed_row(i: int) -> tuple:
    """The deterministic row for id ``i`` (exposed for tests/oracles)."""
    ts = (EPOCH + timedelta(seconds=i)).replace(tzinfo=None)
    value = ((i * 2654435761) % 1_000_000) / 100.0  # Knuth hash, exact /100
    return (i, ts, _OPS[i % 10], value)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class CDCFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.lo = int(options.get("start", 0))
        self.hi = int(options["end"])
        self.n_parts = int(options.get("numPartitions", 8))

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if f.attribute != ("id",):
                yield f                     # not ours: Spark evaluates it
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.hi, self.lo)
        n = max(1, min(self.n_parts, hi - lo or 1))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [_RangePartition(p, min(p + step, hi))
                for p in range(lo, hi, step)] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield feed_row(i)


class CDCFeedDataSource(DataSource):
    """``spark.dataSource.register(CDCFeedDataSource)`` then
    ``spark.read.format("cdc_feed").option("end", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "cdc_feed"

    def schema(self) -> str:
        return "id bigint, ts timestamp, op string, value double"

    def reader(self, schema) -> CDCFeedReader:
        return CDCFeedReader(self.options)


# -- Python Data Source WRITER: two-phase-commit JSON-lines sink -----------

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    final_name: str
    n_rows: int


class JsonLinesWriter(DataSourceWriter):
    """Executor tasks write to ``_tmp_*`` files; the driver-side
    ``commit()`` renames every task file into place and drops a
    ``_SUCCESS`` marker, ``abort()`` deletes the temps — the classic
    two-phase output commit, expressed in the Python writer API. A
    reader that requires ``_SUCCESS`` therefore never sees a torn
    write (same contract as Spark's own FileOutputCommitter v1)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _FileCommit:
        part = uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f"_tmp_{part}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str,
                                    sort_keys=True) + "\n")
                n += 1
        return _FileCommit(tmp_name=tmp,
                           final_name=os.path.join(
                               self.path, f"part-{part}.jsonl"),
                           n_rows=n)

    def commit(self, messages) -> None:
        for m in messages:
            os.rename(m.tmp_name, m.final_name)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(sum(m.n_rows for m in messages)))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_name)
            except FileNotFoundError:
                pass


class JsonLinesSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", p).mode("append")``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        if overwrite:
            raise NotImplementedError(
                "jsonl_sink is append-only (overwrite would need a "
                "directory-swap commit; use the parquet target for that)")
        return JsonLinesWriter(self.options)
