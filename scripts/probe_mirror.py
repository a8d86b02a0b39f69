"""r15 probe: where does index_build_sf10's mirror phase go?

The r14 driver run showed mirror_construct_s at 18.5 s on 32 cores vs
0.84 s on 8 cores (same code, same data) — driver-side numpy over the
9.8M-row rollup should not depend on core count at all, so the swing is
either (a) Arrow chunk layout (more partitions → more chunks → combine
copies), (b) allocator/GC pressure, or (c) pure box contention. This
probe splits _indices_from_rollup's landing into named sub-steps and
prints per-step wall clock plus the Arrow chunk count, at the current
$SPARK_GRAFT_CPUS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.compute as pc

from datafusion_uwheel_spark import WheelEngine, get_spark

EV10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_cache", "sf10", "events.parquet",
)

spark = get_spark(app_name="probe_mirror")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")

for rep in range(2):
    t0 = time.perf_counter()
    eng = WheelEngine(spark, f"events_m{rep}", EV10, time_column="ts")
    t_ctor = time.perf_counter() - t0

    # replicate build_index("value", aggs=("count",)) phase by phase
    from pyspark.sql import functions as F

    from datafusion_uwheel_spark.operators.rollups import (
        state_agg_exprs,
        time_sec_col,
    )

    g = eng.df.filter(F.col("ts").isNotNull()).select("ts", "value")
    aggs, types = state_agg_exprs(g, "ts", ["value"], ())
    sec = time_sec_col(g, "ts")
    rolled = g.groupBy(sec.alias("__sec")).agg(*aggs)

    t0 = time.perf_counter()
    tbl = rolled.orderBy("__sec").toArrow()
    t_scan = time.perf_counter() - t0

    steps = {}

    def step(name):
        steps[name] = time.perf_counter()

    t0 = time.perf_counter()
    col = tbl.column("__sec")
    nchunks = col.num_chunks
    secs_raw = np.asarray(col)
    step("sec_to_numpy")
    mono = bool(np.all(secs_raw[1:] > secs_raw[:-1]))
    step("monotone_check")
    cnt_col = tbl.column("__cnt")
    if cnt_col.null_count:
        cnt_col = pc.fill_null(cnt_col, 0)
    cnt = np.asarray(cnt_col).astype(np.int64, copy=False)
    step("cnt_to_numpy")
    min_us = int(pc.min(tbl.column("__tmin")).as_py())
    max_us = int(pc.max(tbl.column("__tmax")).as_py())
    step("tmin_tmax")
    atcnt_col = tbl.column("__atcnt")
    if atcnt_col.null_count:
        atcnt_col = pc.fill_null(atcnt_col, 0)
    atcnt = np.asarray(atcnt_col).astype(np.int64, copy=False)
    at_mask = atcnt > 0
    n_at = int(at_mask.sum())
    at_secs = secs_raw[at_mask]
    at_cnt = atcnt[at_mask]
    step("at_sliver")
    vcnt = np.asarray(pc.fill_null(tbl.column("__vcnt_value"), 0)).astype(
        np.int64, copy=False
    )
    atv = np.asarray(pc.fill_null(tbl.column("__atvcnt_value"), 0)).astype(
        np.int64, copy=False
    )
    at_vcnt = atv[at_mask]
    step("value_vcnt")

    prev = t0
    out = []
    for name, tv in steps.items():
        out.append(f"{name} {tv - prev:.3f}s")
        prev = tv
    print(
        f"cpus={cpus} rep={rep}: ctor {t_ctor:.2f}s, scan+collect {t_scan:.2f}s | "
        f"rows={tbl.num_rows} chunks={nchunks} mono={mono} at_rows={n_at} | "
        + " ".join(out),
        flush=True,
    )
    del tbl, secs_raw, cnt, atcnt, at_secs, at_cnt, vcnt, atv, at_vcnt

spark.stop()
