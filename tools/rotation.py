"""Regenerate ROTATION.json — the driver-attestation rotation schedule.

Policy (COVERAGE.md "Driver-attestation rotation"): the driver hashes a
leading window of 50 registry entries per round. To guarantee every entry
a driver correctness row within ceil(len(registry)/50) rounds, each round
the window carries the entries that have waited longest for a hash:

  1. never-hashed entries, in registry (_WINDOW + _TAIL) order;
  2. then hashed entries, oldest last-hash-round first.

Run AFTER a round's CORRECTNESS_r{N}.json lands:

    python tools/rotation.py            # prints the proposed next window
    python tools/rotation.py --write    # rewrites ROTATION.json for it

then paste the proposed window into parity_ext._WINDOW (moving the
displaced entries to the head of the hashed section of _TAIL) and commit
both. tests/test_window_lint.py asserts _WINDOW == ROTATION.json's
window for the current round, so the schedule cannot silently drift.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def last_hash_rounds() -> dict[str, int]:
    """entry -> most recent round with a hash_match=True driver row."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            data = json.load(open(f))
        except ValueError:
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def registry_order() -> list[str]:
    from s3_redshift_backup_tool_spark.parity import REGISTRY
    import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401
    return list(REGISTRY)


def propose(entries: list[str], last: dict[str, int],
            size: int = WINDOW_SIZE) -> list[str]:
    never = [n for n in entries if n not in last]
    hashed = sorted((n for n in entries if n in last),
                    key=lambda n: (last[n], entries.index(n)))
    return (never + hashed)[:size]


def main() -> None:
    last = last_hash_rounds()
    entries = registry_order()
    latest_round = max(last.values(), default=0)
    nxt = latest_round + 1
    window = propose(entries, last)
    never_left = [n for n in entries if n not in last and n not in window]
    print(f"# proposed _WINDOW for round r{nxt:02d} "
          f"({len([n for n in window if n not in last])} first-time):")
    for n in window:
        print(f'    "{n}",')
    if "--write" in sys.argv:
        sched = {
            "policy": "Each round the driver window (50 slots) carries "
                      "the registry entries that have waited longest for "
                      "a driver correctness hash: never-hashed first in "
                      "registry order, then oldest last-hash. New "
                      "registry entries join the never-hashed queue "
                      "ahead of re-attestation. Regenerate with "
                      "tools/rotation.py after each round's CORRECTNESS "
                      "artifact lands; tests/test_window_lint.py asserts "
                      "_WINDOW matches.",
            "round": nxt,
            f"window_r{nxt}": window,
            "never_hashed_backlog": never_left,
        }
        json.dump(sched, open(os.path.join(REPO, "ROTATION.json"), "w"),
                  indent=1)
        print(f"# ROTATION.json written for r{nxt:02d}; "
              f"backlog after this window: {len(never_left)}")


if __name__ == "__main__":
    main()
