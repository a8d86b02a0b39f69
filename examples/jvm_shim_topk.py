"""Deterministic probe for the shim's routed TOP-K dashboard shape (r9):
``SELECT key, COUNT(*) AS n FROM t WHERE <aligned range> GROUP BY key
ORDER BY n DESC, key LIMIT k`` over a registered dim (partitioned-family)
view — plain ``spark.sql``, no engine call. The count-led sort is a TOTAL
order (the key tie-break makes ranks unique and counts are exact
integers), so the LIMIT's kept set must match the delegate scan
row-for-row, and the aligned cases must answer WITHOUT touching a table
file. Runs in a subprocess (the extensions class must load with the JVM);
see ``tests/test_jvm_shim.py``. The randomized sibling lives in
``jvm_shim_fuzz.py`` (count-led ORDER BY ... LIMIT matrix entry).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

A, B = "2024-01-03 00:00:00", "2024-01-10 00:00:00"

#: (sql, description) — all must rewrite (no table-file scan) AND match
#: the delegate scan row-for-row INCLUDING row order (total order).
CASES = [
    (
        f"SELECT event_type AS k, COUNT(*) AS n FROM events "
        f"WHERE ts >= '{A}' AND ts < '{B}' "
        "GROUP BY event_type ORDER BY n DESC, k LIMIT 3",
        "dashboard top-k, aligned range",
    ),
    (
        f"SELECT event_type AS k, COUNT(*) AS n FROM events "
        f"WHERE ts >= '{A}' AND ts < '{B}' "
        "GROUP BY event_type ORDER BY n DESC, k LIMIT 1",
        "top-1 (the argmax form)",
    ),
    (
        f"SELECT event_type AS k, COUNT(value) AS n FROM events "
        f"WHERE ts >= '{A}' AND ts < '{B}' "
        "GROUP BY event_type ORDER BY n DESC, k LIMIT 3",
        "COUNT(col) top-k (vcnt state)",
    ),
    (
        "SELECT event_type AS k, COUNT(*) AS n FROM events "
        "GROUP BY event_type ORDER BY n DESC, k LIMIT 2",
        "landmark top-k (no WHERE)",
    ),
    (
        f"SELECT date_trunc('day', ts) AS b, event_type AS k, COUNT(*) AS n "
        f"FROM events WHERE ts >= '{A}' AND ts < '{B}' "
        "GROUP BY date_trunc('day', ts), event_type "
        "ORDER BY n DESC, b, k LIMIT 5",
        "per-day top-k (time + dim grouping)",
    ),
]

#: must fall through (unregistered key column) and still match the scan.
FALLTHROUGH = [
    f"SELECT props AS k, COUNT(*) AS n FROM events "
    f"WHERE ts >= '{A}' AND ts < '{B}' "
    "GROUP BY props ORDER BY n DESC, k LIMIT 3",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.jvmshim import (
        build_shim_jar,
        register_count_rollup,
        register_dim_rollup,
        shim_builder_confs,
    )

    builder = (
        SparkSession.builder.appName("uwheel-shim-topk")
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
    eng.build_partitioned_index("value", partition_by="event_type")
    register_dim_rollup(spark, eng, "event_type")
    tables_conf = spark.conf.get("spark.uwheel.shim.tables")

    def delegate(sql):
        spark.conf.set("spark.uwheel.shim.tables", "")
        want = [tuple(r) for r in spark.sql(sql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", tables_conf)
        return want

    rewritten = 0
    for sql, desc in CASES:
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        used_rollup = "LocalTableScan" in plan or "__uwheel_rollup_" in plan
        scans_table = "events.parquet" in plan
        # ORDERED compare — exact integer counts + full-key tie-break make
        # the LIMIT's kept set AND its order deterministic on both paths
        got = [tuple(r) for r in df.collect()]
        want = delegate(sql)
        assert got == want, (
            f"MISMATCH ({desc}):\n{sql}\nshim: {got}\nscan: {want}"
        )
        assert used_rollup and not scans_table, (
            f"NOT REWRITTEN ({desc}):\n{sql}\n{plan[:800]}"
        )
        rewritten += 1
    for sql in FALLTHROUGH:
        assert [tuple(r) for r in spark.sql(sql).collect()] == delegate(sql), (
            f"FALLTHROUGH MISMATCH:\n{sql}"
        )
    print(
        f"OK shim top-k: {rewritten} dashboard top-k shapes rewritten "
        f"(no table scan, ordered row match), "
        f"{len(FALLTHROUGH)} fall-throughs match the scan"
    )


if __name__ == "__main__":
    main()
