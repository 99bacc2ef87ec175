"""One-step round close-out (r13 verdict item 1).

Three end-of-round bookkeeping steps kept drifting apart — r12 and r13
both closed with a red doc-lint because a snapshot commit carried
re-probed `scale_probe_results.json` rows without re-rendering the
SCALE.md archetype block. This script is the single close-out action:

1. fold any pending bench-regressions sidecars into PERF.md
   (tools/fold_regressions.py),
2. re-render the SCALE.md archetype block from the current probe
   results (tools/archetypes.py --write),
3. run the doc-lint tests that gate both renders
   (tests/test_archetype_map.py),

and exits non-zero if any step fails — run it BEFORE the final commit
of a session, and again after any late probe refresh.

Usage: python tools/close_round.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    steps = [
        [sys.executable, os.path.join(REPO, "tools", "fold_regressions.py")],
        [sys.executable, os.path.join(REPO, "tools", "archetypes.py"),
         "--write"],
        [sys.executable, "-m", "pytest", "tests/test_archetype_map.py",
         "-q"],
    ]
    for cmd in steps:
        print(f"close_round: {' '.join(os.path.basename(c) if i == 0 else c for i, c in enumerate(cmd))}",
              file=sys.stderr)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            print(f"close_round: FAILED ({rc}): {cmd}", file=sys.stderr)
            return rc
    print("close_round: clean — safe to make the final commit",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
