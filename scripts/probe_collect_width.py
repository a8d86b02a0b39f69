"""r15 probe: how much of index_build_sf10's scan+rollup+collect phase is
column width?

Same 9.8M-bucket rollup, three collected shapes, interleaved:
  full7   — the current build projection (sec/cnt/tmin/tmax/atcnt/vcnt/atvcnt)
  narrow  — tmin/tmax as int32 bucket offsets (exact: offset < 1e6 fits)
  two     — sec+cnt only (the floor)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_uwheel_spark import get_spark
from datafusion_uwheel_spark.operators.rollups import (
    state_agg_exprs,
    time_sec_col,
)

EV10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_cache", "sf10", "events.parquet",
)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    "probe_collect_width", master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
)

df = spark.read.parquet(EV10).filter(F.col("ts").isNotNull()).select("ts", "value")
aggs, types = state_agg_exprs(df, "ts", ["value"], states=())
sec = time_sec_col(df, "ts")
rolled = df.groupBy(sec.alias("__sec")).agg(*aggs)

shapes = {
    "full7": rolled,
    "narrow": rolled.select(
        "__sec", "__cnt",
        (F.col("__tmin") - F.col("__sec") * 1_000_000).cast("int").alias("__tmin_off"),
        (F.col("__tmax") - F.col("__sec") * 1_000_000).cast("int").alias("__tmax_off"),
        "__atcnt", "__vcnt_value", "__atvcnt_value",
    ),
    "two": rolled.select("__sec", "__cnt"),
}

for rep in range(3):
    for name, frame in shapes.items():
        spark.sparkContext.setJobDescription(f"collect {name} rep={rep}")
        t0 = time.perf_counter()
        tbl = frame.orderBy("__sec").toArrow()
        dt = time.perf_counter() - t0
        print(
            f"rep={rep} {name}: {dt:.2f}s rows={tbl.num_rows} "
            f"bytes={tbl.nbytes/1e6:.0f}MB",
            flush=True,
        )
        del tbl
