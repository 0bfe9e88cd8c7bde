"""Dump .explain("formatted") for every contract query to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> [query ...]
Round dir from $KLEPTO_PLAN_ROUND (default r15).
Writes plans/<round>/<query>_<suffix>.txt. Driver-side only (no job runs),
so it is cheap and safe to run alongside other work; queries whose
CONSTRUCTION runs eager actions (v01/v03, s11's collect, kmeans inits)
do execute those — still far below a bench pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from klepto_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("KLEPTO_PLAN_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
