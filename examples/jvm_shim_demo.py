"""End-to-end demo of the Catalyst shim: plain ``spark.sql`` — not
``engine.sql`` — answered from the wheel rollup by the injected optimizer
rule (``jvm/UwheelShim.scala``), closing SURVEY.md §7.3.1's structural gap
with the reference's drop-in integration (``lib.rs:843-869``).

Runs standalone (``python examples/jvm_shim_demo.py``) and is driven by
``tests/test_jvm_shim.py`` in a subprocess: the extensions class must load
when the JVM starts, so this cannot share the test session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.jvmshim import (
        build_shim_jar,
        register_count_rollup,
        shim_builder_confs,
    )

    builder = (
        SparkSession.builder.appName("uwheel-shim-demo")
        .master("local[2]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
    )
    for k, v in shim_builder_confs(build_shim_jar()).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    eng = WheelEngine(spark, "events", f"{SF}/events.parquet", time_column="ts")
    register_count_rollup(spark, eng)

    a, b = "2024-01-03 00:00:00", "2024-01-10 00:00:00"
    sql = f"SELECT COUNT(*) AS cnt FROM events WHERE ts >= '{a}' AND ts < '{b}'"

    df = spark.sql(sql)  # plain spark.sql — no engine.sql routing
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    physical = df._jdf.queryExecution().executedPlan().toString()
    shimmed = df.collect()[0][0]

    assert "events.parquet" not in optimized and "events.parquet" not in physical, (
        "shim did not rewrite; plan still scans the table:\n" + physical
    )

    # Ground truth 1: the Python router's answer (zero-job wheel lookup).
    routed = eng.sql(sql).collect()[0][0]
    # Ground truth 2: disable the shim (clear the conf) → true delegated scan.
    spark.conf.set("spark.uwheel.shim.tables", "")
    scanned = spark.sql(sql).collect()[0][0]

    assert shimmed == routed == scanned, (shimmed, routed, scanned)

    # Unaligned bound → rule must NOT fire (sound fallthrough).
    spark.conf.set("spark.uwheel.shim.tables", "events")
    odd = f"SELECT COUNT(*) AS cnt FROM events WHERE ts >= '{a}.500' AND ts < '{b}'"
    odd_df = spark.sql(odd)
    odd_physical = odd_df._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in odd_physical or "FileScan" in odd_physical
    spark.conf.set("spark.uwheel.shim.tables", "")
    want_odd = spark.sql(odd).collect()[0][0]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert odd_df.collect()[0][0] == want_odd

    print(f"OK shim: count={shimmed} (rewritten plan, no table scan)")


if __name__ == "__main__":
    main()
