"""Capture .explain("formatted") for every declared query into plans/<tag>/.

Usage: python scripts/capture_plans.py <data_dir> <out_dir> [suffix] [names...]

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before") for each
declared query (all of them when no names are given). Plan capture only —
nothing is executed, so it is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from datafusion_uwheel_spark.session import get_spark  # noqa: E402


def main() -> None:
    data_dir = sys.argv[1]
    out_dir = sys.argv[2]
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    qs = entry.queries()
    if names:
        qs = {n: qs[n] for n in names}
    failures = []
    for name, fn in qs.items():
        try:
            df = fn(spark, data_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"ok   {name}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {exc}")
    print(f"{len(failures)} failures")


if __name__ == "__main__":
    main()
