"""Randomized equivalence fuzz for the Catalyst shim: whatever the rule
does — rewrite or fall through — plain ``spark.sql`` results must be
byte-equal (float-tolerant) to the delegate scan on every generated shape.

Generates aggregate queries across the full matched surface and its edges:
mixed aggregate sets, fine/coarse bucket tables, aligned / unaligned /
half-open / absent / reversed bounds, registered / unregistered key
equalities, every date_trunc granularity including sub-second, and scalar
vs grouped forms. Run standalone or via ``tests/test_jvm_shim.py`` (a
subprocess — the extensions class must load with the JVM).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
N_QUERIES = int(os.environ.get("SHIM_FUZZ_N", "60"))
#: SHIM_FUZZ_PARQUET_VIEWS=1 forces every rollup view onto the parquet
#: backing (max_local_rows=0) — the path large wheels take automatically —
#: so the whole fuzz matrix also proves the file-backed rewrite.
PARQUET_VIEWS = os.environ.get("SHIM_FUZZ_PARQUET_VIEWS") == "1"
#: SHIM_FUZZ_NTZ=1 re-creates the queried temp views from a RAW
#: ``spark.read.parquet`` with NTZ inference on — the testdata is
#: ``isAdjustedToUTC=false``, so this is exactly what a user who never
#: touches ``sources.read_parquet`` sees: TIMESTAMP_NTZ columns. The whole
#: matrix must rewrite (and match the scan) against naive-micros literals.
NTZ_VIEWS = os.environ.get("SHIM_FUZZ_NTZ") == "1"

#: (choice, weight) — biased toward matchable shapes so the fuzz exercises
#: the rewrite path heavily while still probing every fall-through edge.
CORE_AGGS = ["COUNT(*)", "COUNT(value)", "SUM(value)", "AVG(value)", "MIN(value)", "MAX(value)"]
EVENTS_ONLY_AGGS = ["SUM(user_id)", "AVG(user_id)"]  # user_id registered on `events` only
GRANS = ["second", "minute", "hour", "day", "week", "month", "quarter", "year"]
BOUNDS = [
    (("2024-01-03 00:00:00", "2024-01-10 00:00:00"), 4),  # minute+hour aligned
    (("2024-01-03 00:07:00", "2024-01-09 23:41:00"), 3),  # minute aligned only
    (("2024-01-03 00:00:07", "2024-01-09 23:41:13"), 2),  # second aligned only
    (("2024-01-03 00:00:00.500", "2024-01-10 00:00:00"), 1),  # sub-second
    (("2024-01-20 00:00:00", "2024-01-05 00:00:00"), 1),  # reversed (empty)
    (("2030-01-01 00:00:00", "2030-02-01 00:00:00"), 1),  # beyond the data
]
KEYS = [
    (None, 6),
    ("event_type = 'click'", 3),  # registered keyed view on `events`
    ("event_type = 'purchase'", 1),  # unregistered value → scan
    ("event_type = 'zzz'", 1),  # value absent from the data → scan, 0 rows
]
#: tumbling/hopping/offset window() group-by shapes: tumbling rewrites
#: when slide+offset tile the buckets, hopping (Expand) when additionally
#: width % slide == 0; non-tiling widths on coarse buckets and
#: non-dividing hops must fall through — all must match the scan.
WINDOWS = [
    ("window(ts, '1 hour')", 4),
    ("window(ts, '15 minutes')", 3),
    ("window(ts, '90 seconds')", 2),  # tiles 1 s buckets, NOT 60 s ones
    ("window(ts, '1 hour', '30 minutes')", 2),  # hopping → Expand rewrite
    ("window(ts, '6 hours', '2 hours')", 1),  # hopping, 3 replicas
    ("window(ts, '1 hour', '1 hour', '30 minutes')", 2),  # offset start
    ("window(ts, '25 minutes', '10 minutes')", 1),  # non-dividing → scan
    ("window(ts, '97 seconds')", 1),  # odd width — 1 s buckets only
]


def pick(rng, weighted):
    return rng.choices([c for c, _ in weighted], [w for _, w in weighted])[0]


def gen_query(rng: random.Random, table: str) -> str:
    pool = list(CORE_AGGS)
    if table == "events":
        pool += EVENTS_ONLY_AGGS
    aggs = rng.sample(pool, rng.randint(1, 3))
    if rng.random() < 0.12:
        aggs.append("STDDEV(value)")  # variance family — rewrites from sumsq
    if rng.random() < 0.08:
        aggs.append("SKEWNESS(value)")  # never rewrites — fall-through probe
    if rng.random() < 0.2:
        # exact from the dim view on `events`; no family on events_m/user_id
        aggs.append(
            "COUNT(DISTINCT "
            + ("user_id" if rng.random() < 0.25 else "event_type")
            + ")"
        )
    select = [f"{a} AS a{i}" for i, a in enumerate(aggs)]
    gcols = []  # (select_sql, group_sql)
    r = rng.random()
    if r < 0.35:
        g = "millisecond" if rng.random() < 0.1 else rng.choice(GRANS)
        e = f"date_trunc('{g}', ts)"
        gcols.append((f"{e} AS b", e))
    elif r < 0.6:
        w = pick(rng, WINDOWS)
        sel = "window.start AS b" if rng.random() < 0.5 else "window AS b"
        gcols.append((sel, w))
    if rng.random() < 0.35:
        # dim grouping: event_type has a registered family on `events`;
        # user_id never does → fall-through probe
        k = "user_id" if rng.random() < 0.2 else "event_type"
        gcols.append((k + " AS k", k))
    rng.shuffle(gcols)
    select = [s for s, _ in gcols] + select
    group = (
        " GROUP BY " + ", ".join(g for _, g in gcols) if gcols else ""
    )
    conj = []
    # 0=[a,b) 1=lo-only 2=hi-only 3=landmark 4=OR of two ranges 5=ts equality
    shape = rng.choices([0, 1, 2, 3, 4, 5], [5, 1, 1, 1, 2, 1])[0]
    if shape in (0, 1, 2):
        a, b = pick(rng, BOUNDS)
        # `>` / `<=` exercise the hybrid (core + sliver) rewrite on scalar
        # shapes and full fall-through on grouped/keyed ones
        lo_op = ">" if rng.random() < 0.25 else ">="
        hi_op = "<=" if rng.random() < 0.25 else "<"
        if shape in (0, 1):
            conj.append(f"ts {lo_op} '{a}'")
        if shape in (0, 2):
            conj.append(f"ts {hi_op} '{b}'")
    elif shape == 4:
        # OR of ranges (overlapping, disjoint, adjacent): hybrid interval
        # merge on scalar shapes, fall-through on grouped ones
        (a1, b1) = pick(rng, BOUNDS)
        (a2, b2) = pick(rng, BOUNDS)
        conj.append(
            f"((ts >= '{a1}' AND ts < '{b1}') OR (ts >= '{a2}' AND ts <= '{b2}'))"
        )
    elif shape == 5:
        conj.append(
            "ts = '" + pick(rng, BOUNDS)[rng.randint(0, 1)] + "'"
        )
    key = pick(rng, KEYS)
    if key:
        conj.append(key)
    where = (" WHERE " + " AND ".join(conj)) if conj else ""
    having = ""
    if gcols and rng.random() < 0.25:
        having = " HAVING COUNT(*) > 5"
    # ORDER BY / LIMIT above the (maybe-)rewritten aggregate: Sort/Limit
    # bind to the rollup merge through preserved ExprIds — a LIMIT's kept
    # set only compares deterministically under a TOTAL order, so sorts
    # with LIMIT always end in the full group-alias list; aggregate-led
    # sorts (rank depends on float value representation, the documented
    # last-ulp caveat) only generate WITHOUT a LIMIT.
    tail = ""
    if gcols and rng.random() < 0.3:
        keys = [s.split(" AS ")[1] for s, _ in gcols]
        parts = [k + (" DESC" if rng.random() < 0.3 else "") for k in keys]
        with_limit = rng.random() < 0.6
        if with_limit and rng.random() < 0.4:
            # r9: the dashboard top-k shape — `ORDER BY n DESC, <all group
            # keys> LIMIT k`. An EXACT integer count leading the sort stays
            # a TOTAL order once every group key follows as tie-break, so
            # the kept set compares deterministically against the scan;
            # float-led sorts with LIMIT stay excluded (last-ulp ranks).
            exact = [
                f"a{i}" for i, a in enumerate(aggs)
                if a in ("COUNT(*)", "COUNT(value)")
            ]
            if exact:
                parts.insert(0, rng.choice(exact) + " DESC")
        elif not with_limit and rng.random() < 0.5:
            parts.insert(0, "a0 DESC")
        tail = " ORDER BY " + ", ".join(parts)
        if with_limit:
            tail += f" LIMIT {rng.choice([1, 3, 7, 100])}"
    return f"SELECT {', '.join(select)} FROM {table}{where}{group}{having}{tail}"


def rows_equal(xs, ys) -> bool:
    if len(xs) != len(ys):
        return False
    for x, y in zip(xs, ys):
        for u, v in zip(x, y):
            if isinstance(u, float) and isinstance(v, float):
                if abs(u - v) > 1e-9 * max(1.0, abs(u), abs(v)):
                    return False
            elif u != v:
                return False
    return True


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.jvmshim import (
        build_shim_jar,
        register_agg_rollup,
        register_count_rollup,
        register_dim_rollup,
        register_keyed_agg_rollup,
        shim_builder_confs,
    )

    builder = (
        SparkSession.builder.appName("uwheel-shim-fuzz")
        .master("local[2]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
    )
    for k, v in shim_builder_confs(build_shim_jar()).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    # fine-bucket table with count + agg (value, user_id) + keyed views
    eng = WheelEngine(spark, "events", f"{SF}/events.parquet", time_column="ts")
    if PARQUET_VIEWS:
        eng._shim_max_local_rows = 0
    register_count_rollup(spark, eng)
    eng.build_index("value")
    eng.build_index("user_id")
    register_agg_rollup(spark, eng, "value")
    register_agg_rollup(spark, eng, "user_id")
    eng.build_index("value", filter="event_type = 'click'")
    register_keyed_agg_rollup(spark, eng, "value", "event_type = 'click'")
    eng.build_partitioned_index("value", partition_by="event_type")
    register_dim_rollup(spark, eng, "event_type")
    # coarse-bucket table, agg view only — its OWN parquet root (the rule
    # recognizes tables by scan path; one engine per root)
    import tempfile

    mdir = os.path.join(tempfile.mkdtemp(prefix="uwheel_fuzz_"), "events_m.parquet")
    if NTZ_VIEWS:
        # copy through an NTZ read so the written file stays NTZ-annotated
        # (writing an LTZ frame would flip it to isAdjustedToUTC=true)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(mdir)
    ceng = WheelEngine(
        spark, "events_m", mdir, time_column="ts", index_granularity="minute"
    )
    if PARQUET_VIEWS:
        ceng._shim_max_local_rows = 0
    ceng.build_index("value")
    register_agg_rollup(spark, ceng, "value")
    spark.read.parquet(mdir).createOrReplaceTempView("events_m")
    if NTZ_VIEWS:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        for name, p in (("events", f"{SF}/events.parquet"), ("events_m", mdir)):
            ndf = spark.read.parquet(p)
            assert dict(ndf.dtypes)["ts"] == "timestamp_ntz", ndf.dtypes
            ndf.createOrReplaceTempView(name)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    tables_conf = spark.conf.get("spark.uwheel.shim.tables")

    rng = random.Random(20260814)
    rewritten = fell_through = hybrid = 0
    for i in range(N_QUERIES):
        table = rng.choice(["events", "events", "events_m"])
        sql = gen_query(rng, table)
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # rewritten plans never scan the SOURCE files (rollup views may be
        # parquet-backed themselves, so match the table file names)
        if "events.parquet" in plan or "events_m.parquet" in plan:
            fell_through += 1
            # hybrid (core + sliver) plans scan BOTH the rollup and the
            # source — only distinguishable when views are file-backed
            if PARQUET_VIEWS and "__uwheel_rollup_" in plan:
                hybrid += 1
            if os.environ.get("SHIM_FUZZ_DEBUG"):
                print("FT", sql)
        else:
            rewritten += 1
            if os.environ.get("SHIM_FUZZ_DEBUG"):
                print("RW", sql)
        got = sorted(map(tuple, df.collect()))
        spark.conf.set("spark.uwheel.shim.tables", "")
        want = sorted(map(tuple, spark.sql(sql).collect()))
        spark.conf.set("spark.uwheel.shim.tables", tables_conf)
        assert rows_equal(got, want), (
            f"MISMATCH on fuzz #{i}:\n{sql}\nshim: {got[:5]}\nscan: {want[:5]}"
        )
    # SELECT * scan-pruning sweep (reference R6/R7 through the rule):
    # whatever the rule does the row counts must match, and a pruned plan
    # is only ever an EMPTY-proof
    star_rng = random.Random(77)
    pruned_n = 0
    for _ in range(30):
        a, b = pick(star_rng, BOUNDS)
        conj = []
        if star_rng.random() < 0.8:
            conj.append(f"ts >= '{a}'")
        if star_rng.random() < 0.8:
            conj.append(f"ts < '{b}'")
        if star_rng.random() < 0.5:
            v = star_rng.choice([-10.0, 0.5, 100000.0, 250.0])
            op = star_rng.choice([">", ">=", "<", "<="])
            conj.append(f"value {op} {v}")
        if not conj:
            continue
        sql = "SELECT * FROM events WHERE " + " AND ".join(conj)
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pruned = "events.parquet" not in plan and "FileScan" not in plan
        got = df.count()
        spark.conf.set("spark.uwheel.shim.tables", "")
        want = spark.sql(sql).count()
        spark.conf.set("spark.uwheel.shim.tables", tables_conf)
        assert got == want, ("star", sql, got, want)
        assert not pruned or got == 0, ("unsound prune", sql)
        pruned_n += pruned
    # file-backed views keep no driver-resident buckets, so the proof (an
    # in-memory iteration) only runs in LocalRelation mode
    assert pruned_n > 0 or PARQUET_VIEWS

    # the generator must exercise both outcomes or it tests nothing
    assert rewritten >= N_QUERIES // 10, (rewritten, fell_through)
    assert fell_through >= N_QUERIES // 10, (rewritten, fell_through)
    mode = "parquet-backed views" if PARQUET_VIEWS else "local views"
    if NTZ_VIEWS:
        mode += ", NTZ tables"
    extra = f" ({hybrid} of those hybrid core+sliver)" if PARQUET_VIEWS else ""
    print(f"OK shim fuzz ({mode}): {N_QUERIES} queries, {rewritten} rewritten, "
          f"{fell_through} fell through{extra}, 0 mismatches")


if __name__ == "__main__":
    main()
