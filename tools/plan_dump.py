"""Dump `.explain("formatted")` for named queries to plans/r14/<name>_<tag>.txt.

Usage: python tools/plan_dump.py <tag> <query> [query ...]

The optimization-round deliverable: commit a `_before` and `_after` plan
file for every query touched this round so plan claims are checkable
without running Spark (OPTIMIZATION_r14.md contract).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan = re.sub(r"\[plan_id=\d+\]", "", plan)
        dest = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(dest, "w") as fh:
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {dest}")


if __name__ == "__main__":
    main()
