"""Default-session parity lint — the driver-environment failure class.

Twice a registry query has been builder-green but driver-red for reasons
that had nothing to do with its answer:

- r3: ``quantize_int8_embeddings`` returned an array column the driver's
  pandas canonicalizer could not hash (now the output-shape lint in
  test_window_lint.py);
- r9: ``python_source_cdc_feed`` depended on
  ``spark.sql.python.filterPushdown.enabled``, which session.py sets but
  Spark 4.1 defaults to false — the driver's own session hard-errored
  with DATA_SOURCE_PUSHDOWN_DISABLED.

The common cause: the builder's tuned session (session.py) differs from
whatever vanilla session the driver builds, so any query that silently
depends on a builder conf (filterPushdown, inferTimestampNTZ, session
timezone, arrow flag) passes every local gate and fails only at the
driver. This test closes the class: it runs the ENTIRE current driver
window through tools/check_parity.py --vanilla in a SUBPROCESS — a fresh
JVM whose SparkSession has none of session.py's confs, only Spark 4.1
defaults — against the DuckDB oracle at the driver's own scale (sf0.01).
A query that needs a conf must set it at runtime inside the query
function (as python_source_cdc_feed now does) or it fails here first.

Subprocess, not ``spark.newSession()``: builder confs are written into
the shared SparkContext conf at JVM launch, so a cloned session still
inherits them — only a separate process is genuinely vanilla.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.01 fixture absent")
def test_driver_window_passes_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_parity.py"),
         "--vanilla", "--window", SF_DIR],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    tail = "\n".join((proc.stdout or "").splitlines()[-60:])
    assert proc.returncode == 0, (
        "driver-window query failed under a DEFAULT SparkSession — it "
        "depends on a builder-session conf and will go red at the "
        f"driver.\n--- check_parity --vanilla tail ---\n{tail}\n"
        f"--- stderr tail ---\n{(proc.stderr or '')[-2000:]}")
    assert ", 0 fail," in tail, f"unexpected summary line:\n{tail}"
