"""Dump .explain('formatted') for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/opt_plans.py <suffix> <query> [query ...]
       (suffix is 'before' or 'after'; tag defaults to r13)

Explain does not execute the job, so this is safe to run on a loaded
host; streaming queries (q_stream_*) are skipped — their registered
fns run a full replay just to build the frame, so plan capture for
them belongs in a timed session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_traffict_prediction_spark import registry  # noqa: E402
from big_data_traffict_prediction_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    tag = os.environ.get("OPT_PLAN_TAG", "r13")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    queries = registry.all_queries()
    for name in names:
        if name.startswith("q_stream_"):
            print(f"skip {name} (streaming — frame build runs the replay)")
            continue
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
