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
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.jvmshim import (
        build_shim_jar,
        register_agg_rollup,
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

    # Unaligned (sub-second) bound → the hybrid path rewrites it to rollup
    # CORE + sliver scan; when scan pruning PROVES the sliver buckets empty
    # the whole plan is rollup-served (no FileScan at all). Either way the
    # answer must equal the true scan.
    spark.conf.set("spark.uwheel.shim.tables", "events")
    odd = f"SELECT COUNT(*) AS cnt FROM events WHERE ts >= '{a}.500' AND ts < '{b}'"
    odd_df = spark.sql(odd)
    spark.conf.set("spark.uwheel.shim.tables", "")
    want_odd = spark.sql(odd).collect()[0][0]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert odd_df.collect()[0][0] == want_odd

    # A shape the rule does not match (expression-valued aggregate) → must
    # NOT fire: sound fallthrough keeps the table scan and the scan answer.
    unmatched = (
        f"SELECT SUM(value * 2) AS s2 FROM events WHERE ts >= '{a}' AND ts < '{b}'"
    )
    un_df = spark.sql(unmatched)
    un_physical = un_df._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in un_physical or "FileScan" in un_physical
    spark.conf.set("spark.uwheel.shim.tables", "")
    want_un = spark.sql(unmatched).collect()[0][0]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    got_un = un_df.collect()[0][0]
    assert abs(got_un - want_un) <= 1e-9 * max(1.0, abs(want_un))

    # ---- r4: the full scalar-aggregate family through plain spark.sql ----
    eng.build_index("value")
    register_agg_rollup(spark, eng, "value")
    multi = (
        "SELECT COUNT(*) AS cnt, COUNT(value) AS vcnt, SUM(value) AS s, "
        "AVG(value) AS a, MIN(value) AS lo, MAX(value) AS hi "
        f"FROM events WHERE ts >= '{a}' AND ts < '{b}'"
    )
    mdf = spark.sql(multi)
    mphys = mdf._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in mphys, (
        "agg shim did not rewrite; plan still scans the table:\n" + mphys
    )
    got = mdf.collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", "")
    want = spark.sql(multi).collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert got["cnt"] == want["cnt"] and got["vcnt"] == want["vcnt"]
    assert abs(got["s"] - want["s"]) <= 1e-9 * max(1.0, abs(want["s"]))
    assert abs(got["a"] - want["a"]) <= 1e-9 * max(1.0, abs(want["a"]))
    assert got["lo"] == want["lo"] and got["hi"] == want["hi"]
    assert [f.dataType for f in mdf.schema.fields] == [
        f.dataType for f in spark.sql(multi).schema.fields
    ], "rewritten schema diverged from the delegate plan"

    # Mixed-column aggregates from the ONE combined view (no view joins):
    # BIGINT user_id sums must come back exact with BIGINT schema.
    eng.build_index("user_id")
    register_agg_rollup(spark, eng, "user_id")
    mixed = (
        "SELECT COUNT(*) AS cnt, SUM(value) AS sv, AVG(user_id) AS au, "
        "SUM(user_id) AS su, MIN(user_id) AS lo "
        f"FROM events WHERE ts >= '{a}' AND ts < '{b}'"
    )
    xdf = spark.sql(mixed)
    xphys = xdf._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in xphys, "mixed-column rewrite did not fire:\n" + xphys
    xg = xdf.collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", "")
    xw = spark.sql(mixed).collect()[0]
    wschema = spark.sql(mixed).schema
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert (xg["cnt"], xg["su"], xg["lo"]) == (xw["cnt"], xw["su"], xw["lo"])
    assert abs(xg["sv"] - xw["sv"]) <= 1e-9 * max(1.0, abs(xw["sv"]))
    assert abs(xg["au"] - xw["au"]) <= 1e-9 * max(1.0, abs(xw["au"]))
    assert [f.dataType for f in xdf.schema.fields] == [
        f.dataType for f in wschema.fields
    ], "mixed-column schema diverged"

    # Empty aligned range: COUNTs 0, value aggregates NULL (SQL semantics).
    empty = (
        "SELECT COUNT(*) AS cnt, SUM(value) AS s, AVG(value) AS a "
        "FROM events WHERE ts >= '2030-01-01 00:00:00' AND ts < '2030-01-02 00:00:00'"
    )
    e = spark.sql(empty).collect()[0]
    assert e["cnt"] == 0 and e["s"] is None and e["a"] is None, dict(e.asDict())

    # Variance family from the sum-of-squares state: STDDEV/VARIANCE and
    # the _POP/_SAMP forms rewrite (algebraic form over merged monoid
    # states; the delegate computes incrementally, so compare at 1e-9).
    for vsql in (
        f"SELECT STDDEV(value) AS sd, VARIANCE(value) AS vr, COUNT(*) AS c "
        f"FROM events WHERE ts >= '{a}' AND ts < '{b}'",
        f"SELECT STDDEV_POP(value) AS sp, VAR_POP(value) AS vp FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}'",
        f"SELECT date_trunc('day', ts) AS d, STDDEV(value) AS sd FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1 ORDER BY d",
    ):
        vdf = spark.sql(vsql)
        vphys = vdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in vphys, (
            "variance rewrite did not fire:\n" + vsql + "\n" + vphys
        )
        vr_ = [tuple(r) for r in vdf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        vw_ = [tuple(r) for r in spark.sql(vsql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(vr_) == len(vw_) > 0
        for gr, wr in zip(vr_, vw_):
            for x, y in zip(gr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (vsql, gr, wr)
                else:
                    assert x == y, (vsql, gr, wr)
    # empty aligned range answers NULL stddev (LEGACY divide over NULL sums)
    esd = spark.sql(
        "SELECT STDDEV(value) AS sd FROM events "
        "WHERE ts >= '2030-01-01 00:00:00' AND ts < '2030-01-02 00:00:00'"
    ).collect()[0]
    assert esd["sd"] is None

    # Aggregate the shim can't serve (SKEWNESS) → whole plan falls through.
    sd = (
        f"SELECT SKEWNESS(value) AS sk FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}'"
    )
    sd_phys = spark.sql(sd)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in sd_phys or "FileScan" in sd_phys

    # ---- r4: GROUP BY date_trunc through plain spark.sql ----
    for gran in ("hour", "week"):  # fixed + calendar (Spark's own trunc logic)
        gsql = (
            f"SELECT date_trunc('{gran}', ts) AS b, COUNT(*) AS c, "
            "SUM(value) AS s, AVG(value) AS a "
            f"FROM events WHERE ts >= '{a}' AND ts < '{b}' "
            "GROUP BY 1 ORDER BY b"
        )
        gdf = spark.sql(gsql)
        gphys = gdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in gphys, (
            f"group-by {gran} shim did not rewrite:\n" + gphys
        )
        grows = gdf.collect()
        spark.conf.set("spark.uwheel.shim.tables", "")
        wrows = spark.sql(gsql).collect()
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(grows) == len(wrows) > 0, (gran, len(grows), len(wrows))
        for gr, wr in zip(grows, wrows):
            assert gr["b"] == wr["b"] and gr["c"] == wr["c"], (gran, gr, wr)
            assert abs(gr["s"] - wr["s"]) <= 1e-9 * max(1.0, abs(wr["s"]))
            assert abs(gr["a"] - wr["a"]) <= 1e-9 * max(1.0, abs(wr["a"]))

    # ---- keyed wheels through plain spark.sql: a single string-equality
    # conjunct routes to the matching keyed view; unregistered values fall
    # through to the scan.
    from datafusion_uwheel_spark.jvmshim import register_keyed_agg_rollup

    eng.build_index("value", filter="event_type = 'click'")
    register_keyed_agg_rollup(spark, eng, "value", "event_type = 'click'")
    for ksql in (
        "SELECT COUNT(*) AS c, SUM(value) AS s, AVG(value) AS av FROM events "
        f"WHERE event_type = 'click' AND ts >= '{a}' AND ts < '{b}'",
        "SELECT date_trunc('day', ts) AS d, COUNT(*) AS c, MAX(value) AS m "
        f"FROM events WHERE event_type = 'click' AND ts >= '{a}' AND ts < '{b}' "
        "GROUP BY 1 ORDER BY d",
    ):
        kdf = spark.sql(ksql)
        kphys = kdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in kphys, "keyed rewrite did not fire:\n" + kphys
        krows = [tuple(r) for r in kdf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        wrows = [tuple(r) for r in spark.sql(ksql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(krows) == len(wrows) > 0
        for kr, wr in zip(krows, wrows):
            for x, y in zip(kr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (ksql, kr, wr)
                else:
                    assert x == y, (ksql, kr, wr)
    unreg = (
        "SELECT COUNT(*) AS c FROM events "
        f"WHERE event_type = 'purchase' AND ts >= '{a}' AND ts < '{b}'"
    )
    uphys = spark.sql(unreg)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in uphys or "FileScan" in uphys

    # ---- dim group-bys from the partitioned family: GROUP BY key and the
    # time x category dashboard shape through plain spark.sql.
    from datafusion_uwheel_spark.jvmshim import register_dim_rollup

    eng.build_partitioned_index("value", partition_by="event_type")
    register_dim_rollup(spark, eng, "event_type")
    for dsql in (
        "SELECT event_type AS k, COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1 ORDER BY k",
        "SELECT date_trunc('day', ts) AS d, event_type AS k, COUNT(*) AS c, "
        "AVG(value) AS av FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1, 2 ORDER BY d, k",
        "SELECT event_type AS k, MAX(value) AS m FROM events GROUP BY 1 ORDER BY k",
    ):
        ddf = spark.sql(dsql)
        dphys = ddf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in dphys, "dim rewrite did not fire:\n" + dphys
        drows = [tuple(r) for r in ddf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        xrows = [tuple(r) for r in spark.sql(dsql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(drows) == len(xrows) > 0, (dsql, len(drows), len(xrows))
        for dr, xr in zip(drows, xrows):
            for x, y in zip(dr, xr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (dsql, dr, xr)
                else:
                    assert x == y, (dsql, dr, xr)
    # bare-attribute grouping output (no alias) — the optimizer emits the
    # attribute itself, not an Alias, in the result list
    bare = (
        "SELECT event_type, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY event_type ORDER BY event_type"
    )
    bdf = spark.sql(bare)
    bphys = bdf._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in bphys, "bare-attr dim rewrite did not fire:\n" + bphys
    brows = [tuple(r) for r in bdf.collect()]
    spark.conf.set("spark.uwheel.shim.tables", "")
    xrows2 = [tuple(r) for r in spark.sql(bare).collect()]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert brows == xrows2, (brows[:3], xrows2[:3])

    # the dim view also serves key EQUALITY for values with no per-value
    # keyed view — one registration covers every value, absent values
    # included (key-completeness proves their zero rows)
    for kv, min_rows in (("purchase", 1), ("zzz", 1)):
        esql = (
            f"SELECT COUNT(*) AS c, AVG(value) AS av FROM events "
            f"WHERE event_type = '{kv}' AND ts >= '{a}' AND ts < '{b}'"
        )
        edf = spark.sql(esql)
        ephys = edf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in ephys, (
            "dim-equality rewrite did not fire:\n" + ephys
        )
        er = edf.collect()
        spark.conf.set("spark.uwheel.shim.tables", "")
        ew = spark.sql(esql).collect()
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(er) == len(ew) >= min_rows
        assert er[0]["c"] == ew[0]["c"]
        assert (er[0]["av"] is None) == (ew[0]["av"] is None)
        if er[0]["av"] is not None:
            assert abs(er[0]["av"] - ew[0]["av"]) <= 1e-9 * abs(ew[0]["av"])

    # key IN (...) lists route through the dim view too (the Python router's
    # family IN-routing, now in plain spark.sql)
    insql = (
        "SELECT COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE event_type IN ('click', 'view') AND ts >= '{a}' AND ts < '{b}'"
    )
    idf = spark.sql(insql)
    iphys = idf._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in iphys, "IN-list rewrite did not fire:\n" + iphys
    ir = idf.collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", "")
    iw = spark.sql(insql).collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", "events")
    assert ir["c"] == iw["c"] and abs(ir["s"] - iw["s"]) <= 1e-9 * abs(iw["s"])

    # exact COUNT(DISTINCT key) from the key-complete family (alone, mixed
    # with other aggregates, and restricted to one value), plus HAVING
    # above a rewritten group-by (the outer Filter binds by ExprId)
    for xsql in (
        f"SELECT COUNT(DISTINCT event_type) AS d FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}'",
        "SELECT COUNT(DISTINCT event_type) AS d, COUNT(*) AS c, SUM(value) AS s "
        f"FROM events WHERE ts >= '{a}' AND ts < '{b}'",
        "SELECT COUNT(DISTINCT event_type) AS d FROM events "
        f"WHERE event_type = 'click' AND ts >= '{a}' AND ts < '{b}'",
        "SELECT date_trunc('day', ts) AS dd, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1 HAVING COUNT(*) > 30 "
        "ORDER BY dd",
    ):
        xdf = spark.sql(xsql)
        xphys2 = xdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in xphys2, "rewrite did not fire:\n" + xsql
        xr2 = [tuple(r) for r in xdf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        xw2 = [tuple(r) for r in spark.sql(xsql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(xr2) == len(xw2)
        for rr, ww in zip(xr2, xw2):
            for x, y in zip(rr, ww):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (xsql, rr, ww)
                else:
                    assert x == y, (xsql, rr, ww)

    # grouping on an unregistered dimension falls through
    ug = (
        "SELECT user_id AS k, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1"
    )
    ugphys = spark.sql(ug)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in ugphys or "FileScan" in ugphys

    # Half-open and landmark (no WHERE) shapes — sound because only
    # complete wheels register (the rollup holds the whole timeline).
    for hsql in (
        f"SELECT COUNT(*) AS c, SUM(value) AS s FROM events WHERE ts >= '{a}'",
        f"SELECT COUNT(*) AS c, SUM(value) AS s FROM events WHERE ts < '{b}'",
        "SELECT COUNT(*) AS c, SUM(value) AS s, MIN(value) AS lo FROM events",
        "SELECT date_trunc('day', ts) AS d, COUNT(*) AS c FROM events GROUP BY 1",
    ):
        hdf = spark.sql(hsql)
        hphys = hdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in hphys, (
            "half-open/landmark rewrite did not fire:\n" + hsql + "\n" + hphys
        )
        hrows = sorted(map(tuple, hdf.collect()))
        spark.conf.set("spark.uwheel.shim.tables", "")
        wrows = sorted(map(tuple, spark.sql(hsql).collect()))
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(hrows) == len(wrows)
        for hr, wr in zip(hrows, wrows):
            for x, y in zip(hr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (hsql, hr, wr)
                else:
                    assert x == y, (hsql, hr, wr)

    # Sub-second granularity is finer than the wheel → must fall through.
    msql = (
        f"SELECT date_trunc('millisecond', ts) AS b, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1"
    )
    mphys2 = spark.sql(msql)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in mphys2 or "FileScan" in mphys2

    # ---- NULL discipline: all-NULL buckets export NULL states, so the
    # rewritten SUM/MIN/MAX/AVG answer NULL over all-NULL ranges exactly
    # like the delegate scan (testdata has no NULLs, so pin it here).
    nd = tempfile.mkdtemp(prefix="uwheel_shim_nulls_")
    npath = os.path.join(nd, "nulls.parquet")
    spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 1.0),
            ("2024-01-01 00:00:30", None),
            ("2024-01-01 01:00:00", None),  # hour 1: all NULL
            ("2024-01-01 01:30:00", None),
            ("2024-01-01 02:00:00", 5.0),
        ],
        "ts string, v double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "v").write.mode(
        "overwrite"
    ).parquet(npath)
    neng = WheelEngine(spark, "nulls", npath, time_column="ts")
    neng.build_index("v")
    register_agg_rollup(spark, neng, "v")
    nsql = (
        "SELECT COUNT(*) AS cnt, COUNT(v) AS vcnt, SUM(v) AS s, AVG(v) AS a, "
        "MIN(v) AS lo FROM nulls WHERE ts >= '2024-01-01 01:00:00' "
        "AND ts < '2024-01-01 02:00:00'"
    )
    spark.read.parquet(npath).createOrReplaceTempView("nulls")
    nrow = spark.sql(nsql)
    nphys = nrow._jdf.queryExecution().executedPlan().toString()
    assert "nulls.parquet" not in nphys, "null-table rewrite did not fire:\n" + nphys
    r = nrow.collect()[0]
    assert (r["cnt"], r["vcnt"], r["s"], r["a"], r["lo"]) == (2, 0, None, None, None), (
        dict(r.asDict())
    )

    # ---- coarse buckets: a minute-granularity wheel pins bucket_sec=60;
    # minute-aligned asks rewrite, second-aligned-but-unaligned-to-minute
    # asks fall through, and GROUP BY date_trunc('hour') still tiles.
    # One engine per parquet root (the rule matches scans by path) — the
    # coarse engine gets its own copy, and double-registering a root raises.
    mdir = os.path.join(tempfile.mkdtemp(prefix="uwheel_shim_m_"), "events_m.parquet")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(mdir)
    try:
        WheelEngine(
            spark, "events_dup", f"{SF}/events.parquet", time_column="ts"
        )
        dup = WheelEngine(
            spark, "events_dup", f"{SF}/events.parquet", time_column="ts"
        )
        register_count_rollup(spark, dup)
        raise AssertionError("same-root double registration must raise")
    except ValueError as exc:
        assert "already registered" in str(exc)
    ceng = WheelEngine(
        spark, "events_m", mdir, time_column="ts", index_granularity="minute"
    )
    ceng.build_index("value")
    register_agg_rollup(spark, ceng, "value")
    spark.read.parquet(mdir).createOrReplaceTempView("events_m")
    assert spark.conf.get("spark.uwheel.shim.events_m.bucket_sec") == "60"
    csql = (
        "SELECT COUNT(*) AS c, SUM(value) AS s FROM events_m "
        f"WHERE ts >= '{a}' AND ts < '{b}'"  # minute-aligned bounds
    )
    cphys = spark.sql(csql)._jdf.queryExecution().executedPlan().toString()
    # the table's own file is events_m.parquet — assert the scan is GONE and
    # the rollup (a LocalTableScan here, or the parquet view) is read
    # (a bare "events.parquet not in plan" check would pass vacuously)
    assert "events_m.parquet" not in cphys and (
        "LocalTableScan" in cphys or "__uwheel_rollup_events_m" in cphys
    ), "coarse-bucket rewrite did not fire:\n" + cphys
    odd2 = (
        "SELECT COUNT(*) AS c FROM events_m "
        f"WHERE ts >= '2024-01-03 00:00:30' AND ts < '{b}'"  # sub-minute bound
    )
    # sub-minute bound: hybrid core + sliver (the sliver itself may be
    # proven empty and pruned) — the answer must match the scan either way
    odd2_got = spark.sql(odd2).collect()[0][0]
    all_tables_o = spark.conf.get("spark.uwheel.shim.tables")
    spark.conf.set(
        "spark.uwheel.shim.tables",
        ",".join(t for t in all_tables_o.split(",") if t != "events_m"),
    )
    assert odd2_got == spark.sql(odd2).collect()[0][0]
    spark.conf.set("spark.uwheel.shim.tables", all_tables_o)
    gsql2 = (
        "SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events_m "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1"
    )
    gphys2 = spark.sql(gsql2)._jdf.queryExecution().executedPlan().toString()
    assert "events_m.parquet" not in gphys2, (
        "hour-on-minute-buckets did not fire:\n" + gphys2
    )
    gm = (  # minute grouping on minute buckets tiles too
        "SELECT date_trunc('minute', ts) AS m, COUNT(*) AS c FROM events_m "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1"
    )
    gmphys = spark.sql(gm)._jdf.queryExecution().executedPlan().toString()
    assert "events_m.parquet" not in gmphys, (
        "minute-on-minute-buckets did not fire:\n" + gmphys
    )
    # cross-check one coarse rewrite's values against the scan
    cg = spark.sql(csql).collect()[0]
    all_tables = spark.conf.get("spark.uwheel.shim.tables")
    spark.conf.set(
        "spark.uwheel.shim.tables",
        ",".join(t for t in all_tables.split(",") if t != "events_m"),
    )
    cw = spark.sql(csql).collect()[0]
    spark.conf.set("spark.uwheel.shim.tables", all_tables)
    assert cg["c"] == cw["c"] and abs(cg["s"] - cw["s"]) <= 1e-9 * abs(cw["s"])

    # ---- streaming freshness: a maintainer merge re-exports the views, so
    # plain spark.sql sees rows that exist only in the merged rollup (the
    # logical table = files + stream; a stale snapshot would miss them).
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )

    batch = spark.createDataFrame(
        [("2024-02-01 00:00:10", 42.0), ("2024-02-01 00:00:20", 8.0)],
        "ts string, v double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "v")
    StreamingWheelMaintainer(neng).merge_batch(batch)
    fsql = (
        "SELECT COUNT(*) AS c, SUM(v) AS s FROM nulls "
        "WHERE ts >= '2024-02-01 00:00:00' AND ts < '2024-02-02 00:00:00'"
    )
    fdf = spark.sql(fsql)
    fphys = fdf._jdf.queryExecution().executedPlan().toString()
    assert "nulls.parquet" not in fphys, "post-merge rewrite did not fire:\n" + fphys
    fr = fdf.collect()[0]
    assert (fr["c"], fr["s"]) == (2, 50.0), dict(fr.asDict())

    # ---- tumbling window() group-bys — Spark's most idiomatic time
    # grouping shape, beyond the reference's surface (no window support at
    # all, lib.rs:348-358). The rule matches the TimeWindowing-generated
    # struct and regroups the rollup from bucket starts; hopping windows
    # (Expand plans) fall through.
    for wsql in (
        "SELECT window, COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY window(ts, '1 hour') "
        "ORDER BY window",
        "SELECT window.start AS ws, window.end AS we, COUNT(*) AS c, "
        "AVG(value) AS av FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY window(ts, '6 hours') "
        "ORDER BY ws",
        # landmark window group-by (no WHERE): needs the ts_nonnull
        # attestation pinned at registration
        "SELECT window.start AS ws, COUNT(*) AS c FROM events "
        "GROUP BY window(ts, '1 day') ORDER BY ws",
        # startTime-offset windows
        "SELECT window.start AS ws, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' "
        "GROUP BY window(ts, '1 hour', '1 hour', '30 minutes') ORDER BY ws",
    ):
        wdf = spark.sql(wsql)
        wphys = wdf._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in wphys, (
            "window rewrite did not fire:\n" + wsql + "\n" + wphys
        )
        wr_ = [tuple(r) for r in wdf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        ww_ = [tuple(r) for r in spark.sql(wsql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(wr_) == len(ww_) > 0, (wsql, len(wr_), len(ww_))
        for gr, wr in zip(wr_, ww_):
            for x, y in zip(gr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (wsql, gr, wr)
                else:
                    assert x == y, (wsql, gr, wr)
    # hopping windows (Expand plans, width % slide == 0): the rule keeps
    # the Expand but replicates pruned ROLLUP rows through it
    for hsql2 in (
        "SELECT window.start AS ws, COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' "
        "GROUP BY window(ts, '1 hour', '30 minutes') ORDER BY ws",
        "SELECT window, COUNT(*) AS c, AVG(value) AS av FROM events "
        "GROUP BY window(ts, '1 day', '6 hours') ORDER BY window",
    ):
        hdf2 = spark.sql(hsql2)
        hphys2 = hdf2._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in hphys2, (
            "hopping rewrite did not fire:\n" + hsql2 + "\n" + hphys2
        )
        hr2 = [tuple(r) for r in hdf2.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        hw2 = [tuple(r) for r in spark.sql(hsql2).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(hr2) == len(hw2) > 0
        for gr, wr in zip(hr2, hw2):
            for x, y in zip(gr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (hsql2, gr, wr)
                else:
                    assert x == y, (hsql2, gr, wr)
    # a non-dividing hop (width % slide != 0 adds a containment filter)
    # must fall through
    nds = (
        "SELECT window.start AS ws, COUNT(*) AS c FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' "
        "GROUP BY window(ts, '25 minutes', '10 minutes')"
    )
    ndp = spark.sql(nds)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" in ndp or "FileScan" in ndp

    # ---- NULL-ts gate: a table whose time column HAS NULLs must not
    # answer landmark (no-WHERE) shapes from the rollup — the rollup drops
    # NULL-ts rows, an unbounded scan does not. Bounded shapes still
    # rewrite (ts comparisons drop NULLs in the scan too).
    gd = tempfile.mkdtemp(prefix="uwheel_shim_nullts_")
    gpath = os.path.join(gd, "nullts.parquet")
    spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), (None, 99.0), ("2024-01-01 02:00:00", 5.0)],
        "ts string, v double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "v").write.parquet(gpath)
    geng = WheelEngine(spark, "nullts", gpath, time_column="ts")
    geng.build_index("v")
    register_agg_rollup(spark, geng, "v")
    assert spark.conf.get("spark.uwheel.shim.nullts.ts_nonnull") == "false"
    spark.read.parquet(gpath).createOrReplaceTempView("nullts")
    land = "SELECT COUNT(*) AS c, SUM(v) AS s FROM nullts"
    lphys = spark.sql(land)._jdf.queryExecution().executedPlan().toString()
    assert "nullts.parquet" in lphys or "FileScan" in lphys, (
        "landmark over NULL-ts table must not rewrite:\n" + lphys
    )
    lr = spark.sql(land).collect()[0]
    assert (lr["c"], lr["s"]) == (3, 105.0), dict(lr.asDict())  # NULL-ts row counted
    bnd = (
        "SELECT COUNT(*) AS c, SUM(v) AS s FROM nullts "
        "WHERE ts >= '2024-01-01 00:00:00' AND ts < '2024-01-02 00:00:00'"
    )
    bdf2 = spark.sql(bnd)
    bphys2 = bdf2._jdf.queryExecution().executedPlan().toString()
    assert "nullts.parquet" not in bphys2, (
        "bounded shape over NULL-ts table should rewrite:\n" + bphys2
    )
    br2 = bdf2.collect()[0]
    assert (br2["c"], br2["s"]) == (2, 6.0), dict(br2.asDict())

    # ---- parquet-backed rollup views: force file backing
    # (max_local_rows=0 — the path every view takes past _MAX_LOCAL_ROWS
    # rows) and re-run representative shapes. Same answers; the rewritten
    # plan scans the tiny sec-pruned ROLLUP file, never the table, and the
    # driver no longer embeds the buckets into every plan.
    register_agg_rollup(spark, eng, "value", max_local_rows=0)
    register_agg_rollup(spark, eng, "user_id")
    register_dim_rollup(spark, eng, "event_type")
    register_keyed_agg_rollup(spark, eng, "value", "event_type = 'click'")
    for view in (
        "__uwheel_rollup_events__agg",
        "__uwheel_rollup_events__dim0",
        "__uwheel_rollup_events__key0",
    ):
        vplan = spark.table(view)._jdf.queryExecution().analyzed().toString()
        assert "parquet" in vplan and "LocalRelation" not in vplan, (view, vplan)
    for psql in (
        multi,
        f"SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c, SUM(value) AS s "
        f"FROM events WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1 ORDER BY h",
        "SELECT event_type AS k, COUNT(*) AS c, AVG(value) AS av FROM events "
        f"WHERE ts >= '{a}' AND ts < '{b}' GROUP BY 1 ORDER BY k",
        "SELECT COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE event_type = 'click' AND ts >= '{a}' AND ts < '{b}'",
    ):
        pdf2 = spark.sql(psql)
        pphys = pdf2._jdf.queryExecution().executedPlan().toString()
        assert "events.parquet" not in pphys, (
            "parquet-view rewrite did not fire:\n" + psql + "\n" + pphys
        )
        assert "__uwheel_rollup_events" in pphys, (
            "rewritten plan does not scan the file-backed rollup:\n" + pphys
        )
        prows = [tuple(r) for r in pdf2.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        wrows3 = [tuple(r) for r in spark.sql(psql).collect()]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert len(prows) == len(wrows3) > 0, (psql, len(prows), len(wrows3))
        for pr, wr in zip(prows, wrows3):
            for x, y in zip(pr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (psql, pr, wr)
                else:
                    assert x == y, (psql, pr, wr)
    # the pruning filter reaches the rollup parquet scan (row-group
    # min/max stats on sec keep file-backed probes tiny at scale)
    scalar_phys = spark.sql(multi)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in scalar_phys and "sec" in scalar_phys.split(
        "PushedFilters: ["
    )[1].split("]")[0], scalar_phys

    # ---- hybrid (core + sliver) rewrites: BETWEEN / <= / > / unaligned
    # bounds the exact path cannot tile. The plan unions the sec-pruned
    # rollup with a <=2-bucket sliver scan of the table — detectable here
    # because the views are parquet-backed: BOTH sources appear, and the
    # sliver's ts predicate is pushed down. Scan pruning is disabled for
    # the plan-shape asserts (a proven-empty sliver would legitimately
    # drop the scan leg — that composition is fuzz-covered).
    spark.conf.set("spark.uwheel.shim.prune", "false")
    for ysql in (
        "SELECT COUNT(*) AS c, SUM(value) AS s, AVG(value) AS av FROM events "
        f"WHERE ts BETWEEN '{a}' AND '2024-01-09 23:59:59'",
        "SELECT COUNT(*) AS c, MIN(value) AS lo FROM events "
        f"WHERE ts > '{a}' AND ts <= '{b}'",
        "SELECT COUNT(*) AS c, SUM(value) AS s FROM events "
        f"WHERE ts >= '{a}.500' AND ts < '{b}'",
    ):
        ydf = spark.sql(ysql)
        yphys = ydf._jdf.queryExecution().executedPlan().toString()
        assert "__uwheel_rollup_events" in yphys and "events.parquet" in yphys, (
            "hybrid rewrite did not fire:\n" + ysql + "\n" + yphys
        )
        yr = [tuple(r) for r in ydf.collect()]
        spark.conf.set("spark.uwheel.shim.tables", "")
        yw = [tuple(r) for r in spark.sql(ysql).collect()]
        ysch = [f.dataType for f in spark.sql(ysql).schema.fields]
        spark.conf.set("spark.uwheel.shim.tables", "events")
        assert [f.dataType for f in ydf.schema.fields] == ysch, ysql
        for gr, wr in zip(yr, yw):
            for x, y in zip(gr, wr):
                if isinstance(x, float):
                    assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (ysql, gr, wr)
                else:
                    assert x == y, (ysql, gr, wr)

    spark.conf.set("spark.uwheel.shim.prune", "true")

    # ---- SELECT * scan pruning (reference R6/R7 through the rule): the
    # driver-resident count/agg rollups PROVE ranges empty at plan time.
    # NOTE: the `events` views registered above are parquet-backed in this
    # demo phase, so the pruning proof runs against the `events_m` table's
    # LocalRelation views instead where noted; for `events` the cases
    # assert soundness (answers match the scan) rather than plan shape.
    ea, eb = "2024-01-05 00:45:00", "2024-01-05 00:46:00"  # an empty minute
    # earlier sections restored the tables conf to just "events" — the
    # local-view prune case below needs events_m registered again
    tcur = spark.conf.get("spark.uwheel.shim.tables")
    if "events_m" not in tcur.split(","):
        spark.conf.set("spark.uwheel.shim.tables", tcur + ",events_m")

    def _prune_case(sql, expect_rows):
        pdf = spark.sql(sql)
        got_n = pdf.count()
        pphys = pdf._jdf.queryExecution().executedPlan().toString()
        pruned = "FileScan" not in pphys
        all_t = spark.conf.get("spark.uwheel.shim.tables")
        spark.conf.set("spark.uwheel.shim.tables", "")
        want_n = spark.sql(sql).count()
        spark.conf.set("spark.uwheel.shim.tables", all_t)
        assert got_n == want_n == expect_rows, (sql, got_n, want_n, expect_rows)
        assert not pruned or got_n == 0, ("unsound prune", sql)
        return pruned

    # 1. provably-empty aligned range → pruned when a local view exists
    _prune_case(f"SELECT * FROM events WHERE ts >= '{ea}' AND ts < '{eb}'", 0)
    # 2. occupied range → rows survive, never pruned
    _prune_case(
        "SELECT * FROM events WHERE ts >= '2024-01-03 00:00:00' "
        "AND ts < '2024-01-04 00:00:00'",
        35,
    )
    # 3. unaligned empty range (cover proof) and 4. reversed range
    _prune_case(
        f"SELECT * FROM events WHERE ts >= '{ea[:-1]}7.250' AND ts < '{eb}'", 0
    )
    _prune_case(f"SELECT * FROM events WHERE ts >= '{eb}' AND ts < '{ea}'", 0)
    # 5. min/max envelope proof: impossible value over an occupied range
    _prune_case(
        "SELECT * FROM events WHERE ts >= '2024-01-03 00:00:00' "
        "AND ts < '2024-01-04 00:00:00' AND value < -10.0",
        0,
    )
    # 6. satisfiable value predicate → not pruned, rows survive
    _prune_case(
        "SELECT * FROM events WHERE ts >= '2024-01-03 00:00:00' "
        "AND ts < '2024-01-04 00:00:00' AND value >= 0.0",
        35,
    )
    # 7. the kill-switch forces the scan even on a provably-empty range
    spark.conf.set("spark.uwheel.shim.prune", "false")
    off_df = spark.sql(f"SELECT * FROM events WHERE ts >= '{ea}' AND ts < '{eb}'")
    assert "FileScan" in off_df._jdf.queryExecution().executedPlan().toString()
    assert off_df.count() == 0
    spark.conf.set("spark.uwheel.shim.prune", "true")
    # 8. the events_m table kept LocalRelation views → assert a REAL prune
    mdf = spark.sql(f"SELECT * FROM events_m WHERE ts >= '{ea}' AND ts < '{eb}'")
    mphys_p = mdf._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in mphys_p, "local-view prune did not fire:\n" + mphys_p
    assert mdf.count() == 0
    # 9. emptiness proofs never fire on an unregistered predicate column
    _prune_case(
        f"SELECT * FROM events WHERE ts >= '{ea}' AND ts < '{eb}' "
        "AND event_type = 'click'",
        0,
    )
    print("OK shim scan pruning: 9 cases sound (proofs fire on local views)")

    print(f"OK shim: count={shimmed} (rewritten plan, no table scan)")
    print(f"OK shim multi-agg: {dict(got.asDict())} (rewritten, no table scan)")
    print("OK shim parquet-backed views: rewrites fire, answers match scan")


if __name__ == "__main__":
    main()
