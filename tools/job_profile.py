"""Per-query job/stage/task profile: the action-count inventory.

At sf0.1 every Spark job carries a fixed scheduling cost, and at 100 TB
every job is at least one full pass over its inputs — so the number of
jobs a query triggers (eager probes, .first() seeds, per-iteration
checkpoints) is both the local-latency driver AND the scale cost no
config can remove.  This tool runs every registry query isolated under
its own job group and records wall seconds, job count, stage count and
task count, so optimization rounds can rank queries by "passes over the
data" instead of guessing from wall-clock alone.

Usage: python tools/job_profile.py [sf_dir] [name_filter...] > profile.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_redshift_backup_tool_spark.parity import REGISTRY  # noqa: E402
import s3_redshift_backup_tool_spark.parity_ext  # noqa: E402,F401
from s3_redshift_backup_tool_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    filters = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("job_profile", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    # warm codegen + the Python worker pool once, as bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).mapInPandas(
        lambda it: it, schema="id long").write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    names = [n for n in REGISTRY
             if not filters or any(f in n for f in filters)]
    for name in names:
        spec = REGISTRY[name]
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        sc.setJobGroup("", "")
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {"sec": round(sec, 3), "jobs": len(job_ids),
                     "stages": n_stages, "tasks": n_tasks}
        print(f"{name}: {sec:.2f}s jobs={len(job_ids)} "
              f"stages={n_stages} tasks={n_tasks}", file=sys.stderr)
    json.dump(out, sys.stdout, indent=2, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
