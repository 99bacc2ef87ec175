"""Pipeline configuration: the engine's query language.

Mirrors the reference's YAML pipeline + dataclasses
(src/core/configuration_manager.py:22-92; example pipeline
config/pipelines/us_dw_hybrid_v1_2.yml:30-68): per-table CDC strategy,
columns, target rename, additional_where, ordering, dependencies, and the
batch-size hierarchy table > pipeline > default
(multi_schema_commands.py:983-992). On Spark ``batch_size`` no longer
gates a fetch loop — it survives only as an output-file sizing hint
(``maxRecordsPerFile``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ..operators.cdc import CDCConfig

DEFAULT_BATCH_SIZE = 10_000  # reference src/config/settings.py:174


@dataclass
class TableConfig:
    """Per-table sync config (reference TableConfig :22-36)."""

    table_name: str
    cdc_strategy: str = "hybrid"
    cdc_timestamp_column: str | None = None
    cdc_id_column: str | None = None
    cdc_timestamp_format: str = "auto"
    full_sync_mode: str = "replace"
    custom_sql: str | None = None
    target_name: str | None = None
    additional_where: str | None = None
    cdc_ordering: list[str] = field(default_factory=list)
    depends_on: list[str] = field(default_factory=list)
    batch_size: int | None = None          # table-level override
    partition_columns: list[str] = field(default_factory=list)
    column_map: dict[str, str] = field(default_factory=dict)  # P3 rename map
    quality_gate: bool = False             # R9: fail batch pre-write
    max_null_pct: float = 100.0
    not_null_cols: list[str] = field(default_factory=list)

    def cdc_config(self) -> CDCConfig:
        return CDCConfig(
            strategy=self.cdc_strategy,
            timestamp_column=self.cdc_timestamp_column,
            id_column=self.cdc_id_column,
            timestamp_format=self.cdc_timestamp_format,
            full_sync_mode=self.full_sync_mode,
            custom_sql=self.custom_sql,
            additional_where=self.additional_where,
            ordering=list(self.cdc_ordering),
        )

    @property
    def effective_target(self) -> str:
        return self.target_name or self.table_name


@dataclass
class PipelineConfig:
    """Pipeline = source + target + table set (reference :80-92)."""

    name: str
    source: str
    target: str
    tables: list[TableConfig] = field(default_factory=list)
    batch_size: int | None = None          # pipeline-level default
    max_workers: int = 1                   # inter-table parallelism

    def effective_batch_size(self, table: TableConfig) -> int:
        """Hierarchy: table > pipeline > default (reference
        multi_schema_commands.py:983-992)."""
        if table.batch_size:
            return int(table.batch_size)
        if self.batch_size:
            return int(self.batch_size)
        return DEFAULT_BATCH_SIZE

    def topo_ordered_tables(self) -> list[TableConfig]:
        """Order tables respecting ``depends_on`` (Kahn)."""
        by_name = {t.table_name: t for t in self.tables}
        indeg = {t.table_name: 0 for t in self.tables}
        for t in self.tables:
            for dep in t.depends_on:
                if dep in by_name:
                    indeg[t.table_name] += 1
        queue = sorted(n for n, d in indeg.items() if d == 0)
        out: list[TableConfig] = []
        while queue:
            n = queue.pop(0)
            out.append(by_name[n])
            for t in self.tables:
                if n in t.depends_on:
                    indeg[t.table_name] -= 1
                    if indeg[t.table_name] == 0:
                        queue.append(t.table_name)
        if len(out) != len(self.tables):
            raise ValueError("dependency cycle in pipeline tables")
        return out


def _table_from_dict(name: str, d: dict[str, Any]) -> TableConfig:
    proc = d.get("processing", {}) or {}
    return TableConfig(
        table_name=name,
        cdc_strategy=d.get("cdc_strategy", "hybrid"),
        cdc_timestamp_column=d.get("cdc_timestamp_column"),
        cdc_id_column=d.get("cdc_id_column"),
        cdc_timestamp_format=d.get("cdc_timestamp_format", "auto"),
        full_sync_mode=d.get("full_sync_mode", "replace"),
        custom_sql=d.get("custom_sql"),
        target_name=d.get("target_name"),
        additional_where=d.get("additional_where"),
        cdc_ordering=list(d.get("cdc_ordering", []) or []),
        depends_on=list(d.get("depends_on", []) or []),
        batch_size=proc.get("batch_size") or d.get("batch_size"),
        partition_columns=list(d.get("partition_columns", []) or []),
        column_map=dict(d.get("column_map", {}) or {}),
        quality_gate=bool(d.get("quality_gate", False)),
        max_null_pct=float(d.get("max_null_pct", 100.0)),
        not_null_cols=list(d.get("not_null_cols", []) or []),
    )


def pipeline_from_dict(doc: dict[str, Any]) -> PipelineConfig:
    p = doc.get("pipeline", doc)
    proc = p.get("processing", {}) or {}
    tables = [
        _table_from_dict(name, td or {})
        for name, td in (doc.get("tables", {}) or {}).items()
    ]
    return PipelineConfig(
        name=p.get("name", "adhoc"),
        source=p.get("source", "default"),
        target=p.get("target", "default"),
        tables=tables,
        batch_size=proc.get("batch_size"),
        max_workers=int(p.get("max_workers", 1)),
    )


def load_pipeline_yaml(path: str) -> PipelineConfig:
    import yaml
    with open(path) as f:
        return pipeline_from_dict(yaml.safe_load(f))


def adhoc_pipeline(source: str, target: str, table: TableConfig) -> PipelineConfig:
    """Ad-hoc in-memory pipeline (reference
    multi_schema_commands.py:248-319 `_create_adhoc_pipeline_config`)."""
    return PipelineConfig(name=f"adhoc_{source}_{target}", source=source,
                          target=target, tables=[table], batch_size=10_000)
