"""r15 probe: cost of retention_by's bounded-lag variants at sf10.

The r14->r15 inherited change replaced the global single-partition lag
(WindowExec warning, scaling cliff) with a coarse-partition + boundary
stitch. The stitch is CORRECT but its boundary frame re-derives from the
same `periods` aggregation as the window side — Catalyst shares no
subplans across the join, so the theta_union_agg over the whole rollup
runs TWICE, plus a broadcast exchange. This probe times, full-span weekly
at sf10 (the bench's `uw_retention_by_week_jobpath_sf10` shape):

  v_global : the r14 global single-partition lag (baseline, warns)
  v_stitch : the inherited stitch as committed
  v_ckpt   : the stitch with `periods` localCheckpoint(eager=False) —
             the duplicated aggregation materialized once and shared
  v_bound  : single window partitioned by a NON-FOLDABLE constant over a
             provably bounded ask (usable only when start/end bound the
             period count; here full-span is ~105 weeks so it qualifies
             a posteriori — timed for reference)

and asserts all four return identical rows.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_uwheel_spark import WheelEngine, get_spark
from datafusion_uwheel_spark.operators.sketch_retention import _FIXED_GRAN_SECS

EV10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_cache", "sf10", "events.parquet",
)

spark = get_spark(app_name="probe_theta_lag")
eng = WheelEngine(spark, "events_tl", EV10, time_column="ts")
tr = eng.build_theta_index("user_id")
tr._jvm_ops = None  # force the job path, like the bench's jobpath rows

GRAN = "week"
gran_w = _FIXED_GRAN_SECS.get(GRAN, 86400)  # calendar grans: day-aligned
pw = gran_w * tr._LAG_PARTITION_PERIODS


def _periods_df():
    ts = F.timestamp_seconds(F.col("__sec"))
    bucket = F.date_trunc(GRAN, ts)
    return tr._df.groupBy(bucket.alias("period")).agg(
        F.expr("theta_union_agg(__theta)").alias("__s")
    )


def _finish(df):
    n_prev = tr._est("__prev").cast("long")
    n_ret = tr._est("theta_intersection(__s, __prev)").cast("long")
    return df.select(
        "period",
        tr._est("__s").cast("long").alias("n_curr"),
        F.when(F.col("__prev").isNull(), F.lit(None).cast("long"))
        .otherwise(n_prev)
        .alias("n_prev"),
        F.when(F.col("__prev").isNull(), F.lit(None).cast("long"))
        .otherwise(n_ret)
        .alias("n_retained"),
        F.when(
            F.col("__prev").isNotNull() & (n_prev > 0),
            n_ret.cast("double") / n_prev.cast("double"),
        ).alias("retention"),
    ).orderBy("period")


def v_global():
    periods = _periods_df()
    w = Window.orderBy("period")
    return _finish(periods.withColumn("__prev", F.lag("__s").over(w)))


def _stitch(periods):
    part = F.floor(F.col("period").cast("long") / F.lit(pw)).alias("__part")
    periods = periods.select("period", "__s", part)
    w_in = Window.partitionBy("__part").orderBy("period")
    lasts = periods.groupBy("__part").agg(
        F.max(F.struct("period", "__s")).alias("__last")
    )
    w_b = Window.partitionBy(F.pmod(F.col("__part"), F.lit(1))).orderBy("__part")
    boundary = lasts.select(
        "__part", F.lag(F.col("__last.__s")).over(w_b).alias("__bprev")
    )
    return _finish(
        periods.withColumn("__rn", F.row_number().over(w_in))
        .withColumn("__ilag", F.lag("__s").over(w_in))
        .join(F.broadcast(boundary), on="__part", how="left")
        .withColumn(
            "__prev",
            F.when(F.col("__rn") == 1, F.col("__bprev")).otherwise(
                F.col("__ilag")
            ),
        )
    )


def v_stitch():
    return _stitch(_periods_df())


def v_ckpt():
    return _stitch(_periods_df().localCheckpoint(eager=False))


def v_bound():
    periods = _periods_df()
    # non-foldable constant partition key: single partition, bounded ask
    w = Window.partitionBy(
        F.pmod(F.floor(F.col("period").cast("long") / F.lit(pw)), F.lit(1))
    ).orderBy("period")
    return _finish(periods.withColumn("__prev", F.lag("__s").over(w)))


variants = {
    "v_global": v_global,
    "v_stitch": v_stitch,
    "v_ckpt": v_ckpt,
    "v_bound": v_bound,
}

rows = {}
for name, fn in variants.items():
    # warm once, then 5 timed reps (median printed)
    rows[name] = [tuple(r) for r in fn().collect()]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = fn().collect()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(
        f"{name:9s} median {ts[2]*1e3:7.1f} ms  spread "
        f"[{ts[0]*1e3:.1f}, {ts[-1]*1e3:.1f}]  rows={len(got)}"
    )

base = rows["v_global"]
for name, got in rows.items():
    assert got == base, f"{name} differs from v_global"
print(f"all variants identical over {len(base)} periods")
