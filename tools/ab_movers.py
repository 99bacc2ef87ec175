"""Isolated A/B for flagged per-query movers (round-5 policy; the bloom
A/B, PERF.md:554-562, is the template).

The r20 sweep flagged five queries 35-45% slower than their r14-era
times (nn_descent_graph_embeddings, scrub_exact_substrings_documents,
knn_graph_embeddings, minhash_lsh_pairs_documents,
salted_join_order_priority). None of their code paths changed between
those sweeps, and all five have benign 10x ratios — the host-drift
hypothesis. This script settles it the way the bloom A/B did: check out
the OLD commit in a worktree, then run old and new builds ALTERNATING
(O N O N ...) in fresh subprocesses so host drift hits both sides
equally; per side keep the best-of-N per query (additive-noise model,
same rationale as _keep_cleaner).

Usage:
    python tools/ab_movers.py [old_commit] [rounds] [names...]
defaults: f1d0422 (the commit whose sweep produced bench_full_r14.json),
3 alternations, and the five r20-flagged movers. Prints one JSON line
with per-query old/new bests and the verdict per mover: "code" if new
is >25% slower than old ON THE SAME HOST AT THE SAME TIME, else
"environment".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MOVERS = [
    "nn_descent_graph_embeddings",
    "scrub_exact_substrings_documents",
    "knn_graph_embeddings",
    "minhash_lsh_pairs_documents",
    "salted_join_order_priority",
]

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
names = json.loads(sys.argv[2])
from s3_redshift_backup_tool_spark.parity import REGISTRY
import s3_redshift_backup_tool_spark.parity_ext  # noqa: F401
from s3_redshift_backup_tool_spark.session import get_spark
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("ab_movers", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.range(1_000).mapInPandas(lambda it: it, schema="id long") \
     .write.format("noop").mode("overwrite").save()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}
for name in names:
    spec = REGISTRY[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_side(path: str, names: list[str]) -> dict[str, float]:
    res = subprocess.run(
        [sys.executable, "-c", _RUNNER, path, json.dumps(names)],
        capture_output=True, text=True, timeout=1200)
    for line in res.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"runner produced no result for {path}:\n"
                       f"{res.stdout[-1500:]}\n{res.stderr[-1500:]}")


def main() -> None:
    old_commit = sys.argv[1] if len(sys.argv) > 1 else "f1d0422"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    movers = sys.argv[3:] or MOVERS
    wt = tempfile.mkdtemp(prefix="ab_movers_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    wt, old_commit], check=True, capture_output=True)
    try:
        old_best: dict[str, float] = {}
        new_best: dict[str, float] = {}
        for i in range(rounds):
            os.sync()
            o = run_side(wt, movers)
            os.sync()
            n = run_side(REPO, movers)
            print(f"# alternation {i + 1}: old={o} new={n}",
                  file=sys.stderr)
            for k, v in o.items():
                old_best[k] = min(old_best.get(k, float("inf")), v)
            for k, v in n.items():
                new_best[k] = min(new_best.get(k, float("inf")), v)
        verdicts = {}
        for k in movers:
            ratio = new_best[k] / old_best[k]
            verdicts[k] = {"old_best": old_best[k],
                           "new_best": new_best[k],
                           "new_over_old": round(ratio, 2),
                           "verdict": ("code" if ratio > 1.25
                                       else "environment")}
        print(json.dumps({"old_commit": old_commit, "rounds": rounds,
                          "movers": verdicts}))
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", wt], capture_output=True)


if __name__ == "__main__":
    main()
