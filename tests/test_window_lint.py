"""Driver-window output-shape lint.

The driver's correctness gate canonicalizes each query's output with
pandas ``sort_values`` over ALL columns before hashing. pandas cannot
sort/hash list-typed cells, so any in-window query that returns a raw
``array``/``map``/``struct`` column fails the gate with
``TypeError: unhashable type: 'list'`` even when its values are correct
(round-3 lesson: ``quantize_int8_embeddings``). This lint pins the
invariant at plan time — no execution, just schema resolution — so a
shape break is caught by CI before the driver ever sees it.

Complex-typed *intermediate* columns are fine; only the final projection
of the leading ``WINDOW`` queries must be scalar. Tail queries are
exempt (the driver never canonicalizes them) but are still
oracle-checked by tests/test_full_parity.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from s3_redshift_backup_tool_spark.parity import REGISTRY
import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401  (extends REGISTRY)

# The driver checks the leading window of the registry (50 entries).
WINDOW = 50

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", list(REGISTRY)[:WINDOW])
def test_window_query_output_is_driver_sortable(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"in-window query {name!r} returns complex-typed column(s) {bad}; "
        "the driver canonicalizer (pandas sort_values) cannot hash them — "
        "serialize (e.g. array_join) or explode to scalar rows, mirrored "
        "in the oracle SQL")


def test_window_queries_all_have_oracles():
    # Every in-window entry must carry oracle SQL: a rows-only row in the
    # driver artifact is a weaker signal and the window is the shop front.
    missing = [n for n in list(REGISTRY)[:WINDOW] if REGISTRY[n].oracle is None]
    assert not missing, f"in-window queries without oracle SQL: {missing}"
