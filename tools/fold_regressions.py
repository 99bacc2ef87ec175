"""Fold bench.py's untracked regressions sidecar(s) into PERF.md.

bench.py used to rewrite PERF.md's marked bench-regressions block
directly, which left the tree dirty at round close for three
consecutive rounds — the driver runs bench AFTER the session's final
commit (r12 verdict item 5). bench.py now writes the block to an
untracked sidecar `bench_regressions_r{NN}.md`; this tool, run as the
FIRST action of the next session, replaces PERF.md's marked block
with the newest sidecar's content and deletes the folded sidecars, so
the PERF.md edit happens inside a commit and `git status` is clean at
every round close (driver artifacts excepted).

Usage: python tools/fold_regressions.py            # fold + delete
       python tools/fold_regressions.py --check    # exit 1 if pending
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOCK_RE = re.compile(
    r"<!-- bench-regressions:start.*?<!-- bench-regressions:end -->", re.S)


def pending_sidecars() -> list[str]:
    return sorted(
        glob.glob(os.path.join(REPO, "bench_regressions_r*.md")),
        key=lambda f: int(re.search(r"r(\d+)\.md$", f).group(1)))


def fold() -> list[str]:
    sidecars = pending_sidecars()
    if not sidecars:
        return []
    with open(sidecars[-1]) as fh:
        block = fh.read().strip()
    if not BLOCK_RE.search(block):
        raise SystemExit(f"{sidecars[-1]} does not carry the marked "
                         "bench-regressions block")
    perf = os.path.join(REPO, "PERF.md")
    text = open(perf).read() if os.path.exists(perf) else ""
    text = (BLOCK_RE.sub(lambda _: block, text) if BLOCK_RE.search(text)
            else text.rstrip() + "\n\n" + block + "\n")
    with open(perf, "w") as fh:
        fh.write(text)
    for f in sidecars:
        os.unlink(f)
    return sidecars


def main() -> None:
    if "--check" in sys.argv:
        pend = pending_sidecars()
        if pend:
            print(f"pending: {', '.join(os.path.basename(f) for f in pend)}")
            raise SystemExit(1)
        print("no pending regressions sidecars")
        return
    folded = fold()
    if folded:
        print(f"folded {os.path.basename(folded[-1])} into PERF.md "
              f"(removed {len(folded)} sidecar(s))")
    else:
        print("nothing to fold")


if __name__ == "__main__":
    main()
