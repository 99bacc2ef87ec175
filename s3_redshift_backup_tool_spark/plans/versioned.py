"""Manifest-versioned parquet table: atomic commits, snapshot reads,
time travel, rollback — on storage with NO atomic directory rename.

The repo's rename-aside swaps (rollup/scd2/streaming upsert) are
correct on POSIX filesystems, but object stores (the reference's S3
world) have no atomic rename — the industry answer (Iceberg/Delta) is
a METADATA pointer: data files are immutable and append-only, each
commit writes a new manifest listing the file set, and one tiny
"current version" pointer flips atomically. This module is that
mechanism reduced to its core, compatible with everything here:

- data files land under ``data/`` with unique names (never rewritten,
  never renamed — object-store safe);
- a commit writes ``_versions/v{N}.json`` (the full file list — O(files)
  metadata, fine up to ~100k files; beyond that Iceberg's manifest
  trees are the swap) then writes the ``_current`` pointer via
  write-temp + ``os.replace`` (atomic on POSIX; on S3 the equivalent
  is a conditional PUT / DynamoDB pointer — one swap point, documented);
- readers resolve a version (default: current) and read EXACTLY those
  files — concurrent with any writer, no torn reads, and old versions
  stay readable until ``vacuum``;
- ``rollback(n)`` re-points to an old manifest without touching data;
- ``vacuum()`` deletes files unreferenced by any retained version.

Single-writer by contract (CDC sync is one job per table); the
advisory lock in ``state.py`` is the guard if two schedulers race.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _plain_path(p: str) -> str:
    """``input_file_name()`` returns a ``file:``-scheme URI; manifests
    store plain OS paths — normalize so the two compare equal."""
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "_versions")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- pointer ----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.path, "_current")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _set_pointer(self, version: int) -> None:
        tmp = self._pointer_path() + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer_path())   # the ONE atomic flip

    # -- manifests --------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    # -- write ------------------------------------------------------------
    @staticmethod
    def _file_stats(path: str, cols: list[str]) -> dict:
        """Per-file [min, max] for ``cols`` out of the parquet FOOTER —
        already computed by the writer, so collecting it is a metadata
        read, not a data scan. Numeric/string/bool only; a column whose
        stats are absent is recorded as null (= never prunable)."""
        import pyarrow.parquet as pq
        md = pq.ParquetFile(path).metadata
        idx = {name: i for i, name in enumerate(md.schema.names)}
        out = {}
        for c in cols:
            if c not in idx:
                out[c] = None
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        ok = False
                        break
                import datetime as _dt
                if isinstance(mn, (_dt.datetime, _dt.date)):
                    # ISO strings: JSON-serializable AND ordered
                    # lexicographically == chronologically, so pruning
                    # works when `where` bounds are ISO strings too
                    mn, mx = mn.isoformat(), mx.isoformat()
                lo = mn if lo is None else min(lo, mn)
                hi = hi if hi is not None and hi >= mx else mx
            out[c] = [lo, hi] if ok and lo is not None else None
        return out

    def _publish(self, files: list[str], mode: str, note: str | None,
                 stats: dict | None, extra: dict | None = None) -> int:
        cur = self.current_version()
        version = (cur or 0) + 1
        prev_stats = {}
        if cur is not None:
            prev_stats = self._read_manifest(cur).get("stats") or {}
        merged_stats = {f: prev_stats.get(f) for f in files}
        if stats:
            merged_stats.update(stats)
        manifest = {"version": version, "mode": mode,
                    "committed_at": time.time(), "note": note,
                    "files": files,
                    "stats": {f: s for f, s in merged_stats.items()
                              if s is not None}}
        if extra:
            manifest.update(extra)
        mp = self._manifest_path(version)
        with open(mp + ".tmp", "w") as fh:
            json.dump(manifest, fh)
        os.replace(mp + ".tmp", mp)
        self._set_pointer(version)
        return version

    def commit(self, df: DataFrame, mode: str = "append",
               note: str | None = None,
               stats_cols: list[str] | None = None) -> int:
        """Write ``df`` as new immutable data files and publish the next
        version. ``append`` unions with the current file set;
        ``overwrite`` publishes only the new files (old files stay on
        disk for time travel until vacuum). ``note`` is stamped into
        the manifest — an idempotency key: a caller that crashed after
        committing but before recording its own bookkeeping can ask
        :meth:`find_note` whether the work already landed.

        ``stats_cols``: record per-file [min, max] for these columns in
        the manifest (read from the parquet footers the writer already
        produced — metadata only, no data scan). :meth:`read` then
        prunes files by predicate BEFORE Spark ever lists them — the
        Iceberg/Delta data-skipping core; pair with
        ``operators.layout.write_zordered`` so values cluster and the
        min/max ranges actually exclude files."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown mode {mode!r}")
        write_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, write_id)
        df.write.parquet(out)   # unique subdir: no rename, no overwrite
        new_files = sorted(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".parquet"))
        stats = {f: self._file_stats(f, stats_cols) for f in new_files} \
            if stats_cols else None
        cur = self.current_version()
        base = [] if (mode == "overwrite" or cur is None) \
            else self._read_manifest(cur)["files"]
        return self._publish(base + new_files, mode, note, stats)

    def merge(self, delta: DataFrame, keys: list[str],
              note: str | None = None,
              stats_cols: list[str] | None = None) -> int:
        """Copy-on-write MERGE (upsert): rows of ``delta`` replace
        current rows with the same key; unmatched delta keys are
        inserts. The Delta/Iceberg COW discipline at file granularity:

        1. a key semi-join against the snapshot (tagged with
           ``input_file_name()``) finds the TOUCHED files — only file
           names cross the driver, O(files) not O(rows);
        2. only touched files are rewritten (their rows anti-joined
           against the delta keys, then unioned with the whole delta) —
           untouched files are carried into the new manifest BY
           REFERENCE, so a merge that hits 1% of files rewrites 1% of
           the table, not 100%;
        3. the new manifest + pointer flip publish atomically, and the
           pre-merge version stays time-travelable until vacuum.

        At 100 TB this is the difference between an upsert being
        proportional to the delta's key-locality and being a full
        table rewrite; pair with a clustered/z-ordered layout
        (``operators.layout``) so hot keys collocate into few files.
        ``delta`` must be unique on ``keys`` (checked — one aggregate;
        a non-unique delta would make the result order-dependent).
        Contrast: ``plans/scd2.py`` rewrites touched KEYS of a
        dimension with history; this rewrites touched FILES of a fact
        snapshot in place. Reference parity: the upsert half of the
        reference's staged COPY + DELETE/INSERT Redshift load
        (reference src/core/gemini_redshift_loader.py), minus the
        warehouse."""
        null_key = None
        for k in keys:
            cond = F.col(k).isNull()
            null_key = cond if null_key is None else (null_key | cond)
        cnt = delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.struct(*keys)).alias("d"),
            F.count(F.when(null_key, 1)).alias("nulls")).first()
        if cnt["nulls"]:
            raise ValueError(
                f"delta has {cnt['nulls']} rows with NULL in {keys}: "
                "an upsert key must be total (NULL never equi-joins, so "
                "such rows would silently become duplicate inserts)")
        if cnt["n"] != cnt["d"]:
            raise ValueError(
                f"delta is not unique on {keys}: {cnt['n']} rows, "
                f"{cnt['d']} distinct keys")
        cur = self.current_version()
        if cur is None:
            # First-ever merge: no base files to rewrite, but publish
            # through the same manifest shape (merge_keys +
            # rewritten_files) and keep stats_cols so data-skipping
            # applies to the files this merge writes too.
            base, touched = [], set()
        else:
            base = self._read_manifest(cur)["files"]
            snap = self.spark.read.parquet(*base) \
                .withColumn("__file", F.input_file_name())
            dkeys = delta.select(*keys).distinct()
            touched = {
                _plain_path(r["__file"])
                for r in snap.join(dkeys, keys, "left_semi")
                             .select("__file").distinct().collect()}
        write_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, write_id)
        if touched:
            kept_rows = (self.spark.read.parquet(*sorted(touched))
                         .join(dkeys, keys, "left_anti"))
            rewritten = kept_rows.unionByName(
                delta.select(*kept_rows.columns))
        else:
            rewritten = delta
        rewritten.write.parquet(out)
        new_files = sorted(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".parquet"))
        stats = {f: self._file_stats(f, stats_cols) for f in new_files} \
            if stats_cols else None
        return self._publish(
            [f for f in base if f not in touched] + new_files,
            "merge", note, stats,
            extra={"merge_keys": keys, "rewritten_files": sorted(touched)})

    # -- read -------------------------------------------------------------
    def prune_files(self, version: int | None = None,
                    where: tuple | None = None) -> tuple[list[str], int]:
        """File list for a snapshot after manifest-stats pruning.
        ``where = (col, lo, hi)`` keeps only files whose recorded
        [min, max] range for ``col`` intersects [lo, hi]; files without
        stats for the column are conservatively kept. Returns
        (files_to_read, files_skipped) — pure metadata, no Spark job."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._read_manifest(v)
        files = man["files"]
        if where is None:
            return files, 0
        col, lo, hi = where
        stats = man.get("stats") or {}
        keep = []
        for f in files:
            rng = (stats.get(f) or {}).get(col)
            if rng is None or (rng[1] >= lo and rng[0] <= hi):
                keep.append(f)
        return keep, len(files) - len(keep)

    def read(self, version: int | None = None,
             merge_schema: bool = False,
             where: tuple | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: current pointer).
        ``merge_schema=True`` unions column sets across the version's
        files — appends that ADDED columns read as null-padded history
        (the additive half of schema evolution; schema.py's evolution
        diff decides whether an incoming change is additive).

        ``where = (col, lo, hi)`` applies manifest-stats FILE pruning
        (see :meth:`prune_files`) and then the row-level BETWEEN filter
        — so a selective predicate over a clustered column skips whole
        files before Spark lists them, on top of the row-group pruning
        parquet already does. At 100 TB the driver-side manifest check
        replaces an object-store LIST + footer fetch per file."""
        files, _ = self.prune_files(version, where)
        if not files:
            raise FileNotFoundError(
                f"version {version} is empty"
                + (" after pruning" if where else ""))
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*files)
        if where is not None:
            col, lo, hi = where
            from pyspark.sql import functions as F
            df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        return df

    def compact(self, target_file_bytes: int = 128 << 20,
                note: str | None = None,
                stats_cols: list[str] | None = None,
                zorder_cols: list[str] | None = None) -> dict:
        """Bin-pack the current snapshot's SMALL files (< half the
        target size) into ~target-sized ones and publish the result as
        a new version — the antidote to streaming/CDC merge commits
        accreting a file per batch until scan planning is dominated by
        open-file overhead. Large files are carried by reference (never
        rewritten); the pre-compaction version stays time-travelable
        and ``vacuum`` reclaims the replaced small files later.
        Equivalent of OPTIMIZE in Delta/Iceberg, minus clustering —
        for clustered output z-order the data and commit with
        ``stats_cols`` so file skipping bites again after compaction.

        Returns {version, compacted, carried, files_out}; a snapshot
        with fewer than two small files is a no-op (no empty version
        published)."""
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        files = self._read_manifest(cur)["files"]
        sizes = {f: os.path.getsize(f) for f in files}
        small = sorted(f for f in files
                       if sizes[f] < target_file_bytes // 2)
        if len(small) < 2:
            return {"version": cur, "compacted": 0,
                    "carried": len(files), "files_out": len(files)}
        total = sum(sizes[f] for f in small)
        n_out = max(1, -(-total // target_file_bytes))
        write_id = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, write_id)
        packed = self.spark.read.parquet(*small)
        if zorder_cols:
            # cluster while rewriting anyway: range-partition on the
            # z key so the recorded min/max ranges become DISJOINT
            # across output files and stats pruning bites again
            # (compaction without clustering produces files that all
            # span the whole value range — stats that prune nothing)
            from ..operators.layout import zorder_key
            z = zorder_key(packed, zorder_cols)
            packed = (packed.withColumn("__z", z)
                            .repartitionByRange(int(n_out), F.col("__z"))
                            .sortWithinPartitions("__z")
                            .drop("__z"))
        else:
            packed = packed.coalesce(int(n_out))
        packed.write.parquet(out)
        new_files = sorted(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".parquet"))
        stats = {f: self._file_stats(f, stats_cols) for f in new_files} \
            if stats_cols else None
        big = [f for f in files if f not in set(small)]
        version = self._publish(big + new_files, "compact", note, stats,
                                extra={"compacted_files": len(small)})
        return {"version": version, "compacted": len(small),
                "carried": len(big), "files_out": len(big) + len(new_files)}

    def changes(self, v_from: int, v_to: int,
                keys: list[str]) -> DataFrame:
        """Changefeed OUT of the table: the keyed row-level diff between
        two snapshots, classified as insert / update / delete — what a
        downstream consumer needs to follow the table without rescanning
        it (Delta CDF / Iceberg changelog in miniature).

        The manifest makes this cheap: files carried BY REFERENCE
        between the two versions are bit-identical, so only the file
        sets' symmetric difference is read — after a merge that touched
        1% of files, the diff reads 2% of the table, not 200%. Rows in
        common files cancel by construction and never enter the join.
        The remaining full-outer join on ``keys`` classifies:

        - key only in added files            -> insert
        - key only in removed files          -> delete
        - key in both with any column change -> update
        (key in both, rows equal — a file rewrite that carried the row
        unchanged, e.g. compaction — is dropped: no phantom changes.)

        Output: all columns of the TO side (null for deletes) +
        ``_change`` ∈ {insert, update, delete}. Requires ``keys`` to be
        unique per snapshot (the merge/upsert discipline)."""
        man_from = self._read_manifest(v_from)["files"]
        man_to = self._read_manifest(v_to)["files"]
        removed = [f for f in man_from if f not in set(man_to)]
        added = [f for f in man_to if f not in set(man_from)]
        if not removed and not added:
            df = self.read(v_to)
            return (df.select(*df.columns,
                              F.lit("insert").alias("_change"))
                      .limit(0))
        cols = self.read(v_to).columns

        def _side(files: list[str]) -> DataFrame:
            if not files:
                return self.read(v_to).select(*cols).limit(0)
            return self.spark.read.parquet(*files).select(*cols)

        old = _side(removed).select(
            *[F.col(c).alias(f"__o_{c}") for c in cols])
        new = _side(added)
        cond = [new[k].eqNullSafe(old[f"__o_{k}"]) for k in keys]
        j = new.join(old, cond, "full_outer")
        non_keys = [c for c in cols if c not in keys]
        changed = F.lit(False)
        for c in non_keys:
            changed = changed | ~new[c].eqNullSafe(old[f"__o_{c}"])
        kind = (F.when(old[f"__o_{keys[0]}"].isNull(), "insert")
                 .when(new[keys[0]].isNull(), "delete")
                 .when(changed, "update"))
        out_cols = [
            F.coalesce(new[k], old[f"__o_{k}"]).alias(k) for k in keys
        ] + [new[c].alias(c) for c in non_keys]
        return (j.withColumn("_change", kind)
                 .filter(F.col("_change").isNotNull())
                 .select(*out_cols, "_change"))

    def find_note(self, note: str) -> int | None:
        """Version whose manifest carries ``note``, if any (newest wins)."""
        for v in reversed(self.versions()):
            if self._read_manifest(v).get("note") == note:
                return v
        return None

    def rollback(self, version: int) -> None:
        """Re-point to an old manifest; data untouched, O(1)."""
        if version not in self.versions():
            raise ValueError(f"unknown version {version}")
        self._set_pointer(version)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data files unreferenced by the retained versions (the
        last ``keep_last`` plus whatever the pointer targets). Returns
        deleted paths. Old manifests beyond retention are dropped too."""
        vs = self.versions()
        cur = self.current_version()
        keep_versions = set(vs[-keep_last:]) | ({cur} if cur else set())
        referenced: set[str] = set()
        for v in keep_versions:
            referenced.update(self._read_manifest(v)["files"])
        deleted = []
        for sub in os.listdir(self.data_dir):
            d = os.path.join(self.data_dir, sub)
            for f in os.listdir(d):
                full = os.path.join(d, f)
                if f.endswith(".parquet") and full not in referenced:
                    os.remove(full)
                    deleted.append(full)
            if not os.listdir(d):
                os.rmdir(d)
        for v in vs:
            if v not in keep_versions:
                os.remove(self._manifest_path(v))
        return deleted
