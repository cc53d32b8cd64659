"""Capture .explain("formatted") output for a set of queries into
plans/<round>/<query>_<tag>.txt — the optimization round's
before/after plan evidence (the judge reads these files; Spark is not
available to it).

Usage: python tools/capture_plans.py <tag> <query1,query2,...>
       python tools/capture_plans.py before dedup_threshold_sweep,graph_kcore
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_PLANS_ROUND (default r14 — subdirectory of plans/).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from protarrow_spark.queries import all_queries
    from protarrow_spark.session import get_spark

    queries = all_queries()
    spark = get_spark("protarrow-spark-plans", cpus=cpus)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
