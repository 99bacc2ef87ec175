"""Schema system: type mapping, name sanitization, DDL, evolution diff.

Re-implements the reference's dynamic schema manager
(``src/core/flexible_schema_manager.py``) against Spark types:

- MySQL -> Spark type mapping (reference ``_map_mysql_to_pyarrow`` :206-272
  and fallback dicts :545-604), including the two load-bearing quirks:
  decimal precision capped at 18 (:214-219) and unsigned bigint forced to
  signed (:227-230).
- Column-name sanitization: lowercase (s3_manager.py:464-465), ``col_``
  prefix for digit-leading names (flexible_schema_manager.py:857-874).
- StructType -> warehouse DDL emitter (reference Redshift DDL generator
  :274-473, VARCHAR safety buffer :499-507) — emitted as ANSI/Spark SQL.
- Schema-evolution diff: added/removed/modified columns (:667-713).

All driver-side; the per-row cast work lives in ``operators.align``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

DECIMAL_PRECISION_CAP = 18  # Spectrum-compat cap (reference :214-219)
DEFAULT_DECIMAL = T.DecimalType(15, 4)  # reference default decimal128(15,4)
VARCHAR_MAX = 65535


def map_mysql_type(data_type: str,
                   column_type: str = "",
                   numeric_precision: int | None = None,
                   numeric_scale: int | None = None) -> T.DataType:
    """MySQL INFORMATION_SCHEMA (data_type, column_type) -> Spark DataType.

    Mirrors reference ``_map_mysql_to_pyarrow`` (flexible_schema_manager.py
    :206-272). ``column_type`` carries e.g. ``tinyint(1)`` / ``unsigned``.
    """
    dt = (data_type or "").lower().strip()
    ct = (column_type or "").lower()

    if dt in ("decimal", "numeric"):
        if numeric_precision is not None:
            p = min(int(numeric_precision), DECIMAL_PRECISION_CAP)
            s = min(int(numeric_scale or 0), p)
            return T.DecimalType(p, s)
        return DEFAULT_DECIMAL
    if dt in ("varchar", "char", "text", "tinytext", "mediumtext", "longtext"):
        return T.StringType()
    if dt == "bigint":
        return T.LongType()  # unsigned forced to signed (reference :227-230)
    if dt in ("int", "integer", "mediumint"):
        return T.IntegerType()
    if dt == "smallint":
        return T.ShortType()
    if dt == "tinyint":
        if ct.startswith("tinyint(1)"):
            return T.BooleanType()
        return T.ShortType()  # int16, not int8 (reference :244-245)
    if dt in ("float", "real"):
        return T.FloatType()
    if dt == "double":
        return T.DoubleType()
    if dt in ("datetime", "timestamp"):
        return T.TimestampType()
    if dt == "date":
        return T.DateType()
    if dt == "time":
        return T.StringType()  # no native TIME in Spark (SURVEY §1.3)
    if dt == "json":
        return T.StringType()
    if dt in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary"):
        return T.BinaryType()
    if dt in ("enum", "set"):
        return T.StringType()
    if dt == "year":
        return T.IntegerType()
    if dt == "bit":
        return T.BooleanType() if ct in ("bit(1)", "") else T.LongType()
    return T.StringType()  # safe fallback (reference fallback dict :545-604)


def info_schema_query(db_schema: str, table: str) -> str:
    """The reference's discovery query (flexible_schema_manager.py:137-176):
    INFORMATION_SCHEMA.COLUMNS ordered by ordinal position. Run through the
    JDBC source's ``query`` option against a MySQL-dialect endpoint."""
    for ident in (db_schema, table):
        if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", ident or ""):
            raise ValueError(f"invalid identifier: {ident!r}")
    return (
        "SELECT column_name, data_type, is_nullable, "
        "character_maximum_length, numeric_precision, numeric_scale, "
        "column_type, extra "
        "FROM INFORMATION_SCHEMA.COLUMNS "
        f"WHERE table_schema = '{db_schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position"
    )


def columns_to_struct(rows: list[dict]) -> T.StructType:
    """INFORMATION_SCHEMA.COLUMNS rows -> StructType via the §1.3 type map
    (reference ``_get_mysql_table_info`` + ``_map_mysql_to_pyarrow``).
    Column names are sanitized the same way the write path sanitizes them
    so discovery and alignment agree."""
    fields = []
    for r in rows:
        get = r.get if isinstance(r, dict) else (lambda k, d=None: r[k])
        dtype = map_mysql_type(
            get("data_type") or "",
            get("column_type") or "",
            get("numeric_precision"),
            get("numeric_scale"),
        )
        nullable = str(get("is_nullable") or "YES").upper() != "NO"
        fields.append(T.StructField(
            sanitize_column_name(get("column_name")), dtype, nullable))
    return T.StructType(fields)


def sanitize_column_name(name: str) -> str:
    """Lowercase + ``col_`` prefix for digit-leading names + non-word scrub.

    Reference: s3_manager.py:464-465 (lowercase),
    flexible_schema_manager.py:857-874 (digit prefix).
    """
    n = name.strip().lower()
    n = re.sub(r"\W", "_", n)
    if re.match(r"^\d", n):
        n = f"col_{n}"
    return n


def sanitize_table_name(scoped: str) -> str:
    """``scope:a.b`` -> ``scope_a_b`` (reference s3_manager.py:101-127)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", scoped)


def parse_scoped_table(scoped: str) -> tuple[str | None, str | None, str]:
    """``connection_scope:schema.table`` -> (scope, schema, table).

    Reference: flexible_schema_manager.py:65-79 and
    src/backup/base.py:891-912 (_extract_mysql_table_name).
    """
    scope = None
    rest = scoped
    if ":" in scoped:
        scope, rest = scoped.split(":", 1)
    schema = None
    table = rest
    if "." in rest:
        schema, table = rest.rsplit(".", 1)
    return scope, schema, table


_SPARK_TO_SQL = {
    T.LongType(): "BIGINT",
    T.IntegerType(): "INTEGER",
    T.ShortType(): "SMALLINT",
    T.BooleanType(): "BOOLEAN",
    T.FloatType(): "FLOAT",
    T.DoubleType(): "DOUBLE",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
    T.BinaryType(): "BINARY",
}


def spark_type_to_sql(dt: T.DataType, max_length: int | None = None) -> str:
    """Spark type -> warehouse column DDL (reference _map_mysql_to_redshift
    :494-543; VARCHAR 2x-length safety buffer capped 65535, :499-507)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({min(dt.precision, DECIMAL_PRECISION_CAP)},{dt.scale})"
    if isinstance(dt, T.StringType):
        if max_length:
            return f"VARCHAR({min(2 * int(max_length), VARCHAR_MAX)})"
        return f"VARCHAR({VARCHAR_MAX})"
    return _SPARK_TO_SQL.get(dt, "STRING")


MAX_SORT_KEYS = 4  # reference cap (flexible_schema_manager.py:402, :373)


@dataclass
class TableKeys:
    """Physical-layout hints (reference redshift_keys.json + DDL optimizer
    flexible_schema_manager.py:274-473). On Redshift these emit
    DISTKEY/SORTKEY clauses; on a Spark-native target the same hints
    drive bucketBy (dist_key) and sortWithinPartitions (sort_keys)."""
    dist_key: str | None = None       # -> DISTKEY(col) / bucketBy column
    sort_keys: list[str] = field(default_factory=list)  # -> [COMPOUND] SORTKEY
    dist_style: str | None = None     # AUTO | ALL | EVEN (wins over dist_key)
    interleaved: bool = False         # INTERLEAVED SORTKEY variant


def load_table_keys(path: str) -> dict[str, TableKeys]:
    """Parse a ``redshift_keys.json``-shaped file (reference
    ``_load_redshift_optimizations`` :475-492): per-table dicts with
    ``distkey`` / ``sortkey`` (list, string, or "AUTO") /
    ``interleaved_sortkey`` / ``diststyle``. Missing file -> {} (AUTO
    defaults), matching the reference's fallback."""
    import json
    import os
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    out: dict[str, TableKeys] = {}
    for table, cfg in raw.items():
        sort_cfg = cfg.get("interleaved_sortkey") or cfg.get("sortkey") or []
        interleaved = bool(cfg.get("interleaved_sortkey"))
        if isinstance(sort_cfg, str):
            sort_cfg = [] if sort_cfg.upper() == "AUTO" else [sort_cfg]
        out[table] = TableKeys(
            dist_key=cfg.get("distkey"),
            sort_keys=list(sort_cfg)[:MAX_SORT_KEYS],
            dist_style=(cfg.get("diststyle") or None),
            interleaved=interleaved,
        )
    return out


def _key_clauses(keys: TableKeys | None, schema: T.StructType) -> list[str]:
    """DISTKEY/SORTKEY emission (reference :340-461): custom keys validated
    against the schema (missing columns skipped with AUTO fallback, as the
    reference warns-and-continues); default is DISTSTYLE AUTO + SORTKEY
    AUTO (:458-461)."""
    cols = {sanitize_column_name(f.name) for f in schema.fields}
    clauses: list[str] = []
    if keys and keys.dist_style:
        style = keys.dist_style.upper()
        if style in ("AUTO", "ALL", "EVEN"):
            clauses.append(f"DISTSTYLE {style}")
    elif keys and keys.dist_key and sanitize_column_name(keys.dist_key) in cols:
        clauses.append(f"DISTKEY({sanitize_column_name(keys.dist_key)})")
    else:
        clauses.append("DISTSTYLE AUTO")

    valid_sort = [sanitize_column_name(c) for c in (keys.sort_keys if keys else [])
                  if sanitize_column_name(c) in cols][:MAX_SORT_KEYS]
    if valid_sort and keys.interleaved:
        clauses.append(f"INTERLEAVED SORTKEY({', '.join(valid_sort)})")
    elif len(valid_sort) > 1:
        clauses.append(f"COMPOUND SORTKEY({', '.join(valid_sort)})")
    elif valid_sort:
        clauses.append(f"SORTKEY({valid_sort[0]})")
    else:
        clauses.append("SORTKEY AUTO")
    return clauses


def generate_ddl(table: str, schema: T.StructType,
                 keys: TableKeys | None = None,
                 string_lengths: dict[str, int] | None = None) -> str:
    """Emit CREATE TABLE DDL (reference generate_redshift_ddl :274-473)
    with DISTKEY/SORTKEY optimization clauses: per-table overrides from a
    redshift_keys.json-shaped file (via :func:`load_table_keys`), AUTO
    defaults otherwise (:458-461)."""
    string_lengths = string_lengths or {}
    cols = []
    for f in schema.fields:
        name = sanitize_column_name(f.name)
        sql_t = spark_type_to_sql(f.dataType, string_lengths.get(f.name))
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"    {name} {sql_t}{null}")
    body = ",\n".join(cols)
    ddl = f"CREATE TABLE IF NOT EXISTS {table} (\n{body}\n)"
    ddl += "\n" + "\n".join(_key_clauses(keys, schema))
    return ddl


def diff_schemas(old: T.StructType, new: T.StructType) -> dict[str, list]:
    """Schema-evolution diff (reference :667-713; also
    src/utils/schema_migration.py:31-104): added / removed / modified."""
    old_map = {f.name.lower(): f for f in old.fields}
    new_map = {f.name.lower(): f for f in new.fields}
    added = [n for n in new_map if n not in old_map]
    removed = [n for n in old_map if n not in new_map]
    modified = [
        n for n in new_map
        if n in old_map and old_map[n].dataType.simpleString() != new_map[n].dataType.simpleString()
    ]
    return {"added": added, "removed": removed, "modified": modified}


class SchemaCache:
    """TTL'd schema cache (reference :32-36, 606-621; TTL 3600 s)."""

    def __init__(self, ttl_seconds: float = 3600.0, clock=None):
        import time as _time
        self.ttl = ttl_seconds
        self._clock = clock or _time.monotonic
        self._cache: dict[str, tuple[float, T.StructType]] = {}

    def get(self, key: str) -> T.StructType | None:
        hit = self._cache.get(key)
        if hit is None:
            return None
        ts, schema = hit
        if self._clock() - ts > self.ttl:
            del self._cache[key]
            return None
        return schema

    def put(self, key: str, schema: T.StructType) -> None:
        self._cache[key] = (self._clock(), schema)

    def invalidate(self, key: str | None = None) -> None:
        if key is None:
            self._cache.clear()
        else:
            self._cache.pop(key, None)
