"""Python UDTFs (Spark 4 ``pyspark.sql.functions.udtf``) — the
table-function half of the Python-interop surface.

The repo's rule stands: built-ins first. JSON extraction over a KNOWN
schema belongs to ``from_json`` + explode (see
``parity_ext.json_props_extract_events`` — codegen, zero Python), and
every hot-path kernel here rides mapInPandas/applyInPandas. A UDTF is
the right seam when a row must EXPAND into a variable number of rows
via logic that genuinely needs Python — bespoke/malformed formats,
third-party parsers — and Spark 4 runs it Arrow-batched per partition
with lateral-join planning (`LATERAL udtf(col)`), so the expansion
streams without materializing per-row Python lists driver-side.

Reference parity: the reference walks JSON-typed MySQL columns in
Python while staging (src/backup/base.py process_batch); this is that
escape hatch made declarative and parallel.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string", useArrow=True)
class JsonKV:
    """Explode one JSON object string into (key, value-as-string) rows.

    Values are re-serialized with ``json.dumps`` (so nested objects
    survive round-tripping) EXCEPT plain strings, which are emitted
    raw to match SQL ``json_extract_string`` semantics. Malformed or
    non-object payloads yield zero rows instead of failing the task —
    the tolerant-parse behavior a quarantine pipeline wants; pair with
    a count check when silence isn't acceptable."""

    def eval(self, props: str):  # noqa: D401  (UDTF contract)
        if props is None:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            if isinstance(v, str):
                yield k, v
            elif v is None:
                yield k, None
            else:
                yield k, json.dumps(v)


def register_udtfs(spark) -> None:
    """Register the UDTF library for SQL use (idempotent):
    ``SELECT e.*, j.* FROM events e, LATERAL json_kv(e.props) j``."""
    spark.udtf.register("json_kv", JsonKV)
