"""Capture `.explain("formatted")` for registry queries into files.

The optimization-round deliverable: plans/r13/<query>_<tag>.txt for every
query a round touches, captured BEFORE and AFTER the change so the plan
diff (Exchange count, join strategy, PushedFilters, BatchEvalPython
nodes) is reviewable without running Spark.

Usage: python tools/capture_plans.py <tag> <query> [query...]
       python tools/capture_plans.py --dir plans/r13 <tag> <query...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_redshift_backup_tool_spark.parity import REGISTRY  # noqa: E402
import s3_redshift_backup_tool_spark.parity_ext  # noqa: E402,F401
from s3_redshift_backup_tool_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    out_dir = "plans/r13"
    if args and args[0] == "--dir":
        out_dir = args[1]
        args = args[2:]
    tag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans", cpus=cpus, shuffle_partitions=cpus)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        # _explain_string: the public .explain() prints; we need the text
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"))
        print(f"{name}: {path}  Exchange={n_ex} PythonNodes={n_py}")


if __name__ == "__main__":
    main()
