"""Persisted column rename maps (reference P3).

The reference keeps per-table JSON rename maps that translate source
column names to target names and applies them as explicit COPY column
lists (``src/core/column_mapper.py:45-112`` map persistence,
``:201-224`` + ``src/core/gemini_redshift_loader.py:574-599`` the
explicit-column-list application). Here the same maps become one
``df.select(alias...)`` projection — Catalyst prunes unused source
columns for free, which is the COPY-column-list optimization done
declaratively.

Map files live under ``<root>/column_maps/<sanitized_table>.json`` as a
flat ``{"source_col": "target_col"}`` object; unmapped columns pass
through (lowercased, reference ``s3_manager.py:464-465``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import sanitize_column_name, sanitize_table_name


class ColumnMapper:
    """Driver-side registry of per-table column rename maps."""

    def __init__(self, root: str):
        self.root = os.path.join(root, "column_maps")

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{sanitize_table_name(table)}.json")

    def get_mapping(self, table: str) -> dict[str, str]:
        path = self._path(table)
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return dict(json.load(fh))

    def set_mapping(self, table: str, mapping: dict[str, str]) -> None:
        for src, dst in mapping.items():
            if sanitize_column_name(dst) != dst:
                raise ValueError(
                    f"target column {dst!r} for {src!r} is not a sanitized "
                    "identifier (lowercase, no leading digit)")
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(mapping, fh, indent=2, sort_keys=True)
        os.replace(tmp, self._path(table))

    def delete_mapping(self, table: str) -> None:
        path = self._path(table)
        if os.path.exists(path):
            os.remove(path)


def apply_column_map(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns per the map; unmapped columns pass through with
    lowercased names. One projection — no data movement."""
    if not mapping:
        return df
    return df.select(*[
        F.col(c).alias(mapping.get(c, c.lower())) for c in df.columns])


def select_list(source_columns: list[str], mapping: dict[str, str]) -> list[str]:
    """The explicit target-side column list the reference feeds to COPY
    (target may hold extra defaulted columns beyond this list)."""
    return [mapping.get(c, c.lower()) for c in source_columns]
