"""Distributed wheel-index construction (the reference's index build path).

Reference: ``build_count_wheel`` / ``build_min_max_wheel`` / ``build_uwheel``
scan the table once, insert one entry per row, and advance the wheel
(``datafusion-uwheel/src/lib.rs:967-1127``). That design collects **raw rows**
to a single process (``prep_index_data`` → ``collect()``, ``lib.rs:1130-1158``)
— a non-starter at 100 TB.

Spark-first redesign: the per-row insert loop becomes ONE declarative
aggregation job

    df.filter(...).groupBy(ts.cast("long")).agg(count, sum, min, max, ...)

which Catalyst executes with map-side partial aggregation (partial rows per
task are bounded by *distinct seconds*, not input rows), a single shuffle on
the second-bucket key, and whole-stage codegen — then only the **rollup**
(≤ seconds-in-span rows) crosses to the driver via Arrow. Multiple columns'
states are computed in the same single pass.

Column pruning matters at scale: the job selects only the time column and the
indexed columns, so the parquet reader never materializes anything else.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lookup import STAR_AGGREGATION_ALIAS, WheelIndex

__all__ = ["build_wheel_indices", "build_wheel_index"]


def build_wheel_indices(
    df: DataFrame,
    table: str,
    time_column: str,
    columns: Sequence[str] = (),
    filter_expr: Column | str | None = None,
    filter_key: str = STAR_AGGREGATION_ALIAS,
    time_range: tuple | None = None,
    bucket_seconds: int = 1,
    backend: str = "driver",
) -> dict[str | None, WheelIndex]:
    """Build the COUNT wheel plus one value wheel per column in ``columns``,
    all in a single distributed pass.

    Returns ``{None: count_wheel, col: value_wheel, ...}``. ``filter_expr``
    makes keyed indices (reference per-index ``with_filter``,
    ``index/mod.rs:34-40``); ``time_range`` restricts the indexed span
    (``builder.rs:177-191``).

    ``backend="driver"`` collects the rollup into numpy (µs lookups, driver
    memory bounded by distinct buckets); ``backend="spark"`` keeps it as a
    cached DataFrame (:class:`.rollup_table.SparkRollupWheel` — tiny-job
    lookups, unbounded span).
    """
    g = df
    if filter_expr is not None:
        g = g.filter(filter_expr)
    if time_range is not None:
        start, end = time_range
        g = g.filter((F.col(time_column) >= F.lit(start)) & (F.col(time_column) < F.lit(end)))

    # Project early so the scan only reads what the index needs.
    g = g.select(time_column, *columns)

    aggs = [
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.unix_micros(F.col(time_column))).alias("__tmin"),
        F.max(F.unix_micros(F.col(time_column))).alias("__tmax"),
    ]
    for c in columns:
        v = F.col(c).cast("double")
        aggs += [
            F.sum(v).alias(f"__sum_{c}"),
            F.min(v).alias(f"__min_{c}"),
            F.max(v).alias(f"__max_{c}"),
            # Sum of squares — the extra monoid state that derives
            # VAR/STDDEV at lookup (the custom-aggregator extension point;
            # the reference's analogue is a custom uwheel Aggregator impl,
            # aggregator/mod.rs:5-64).
            F.sum(v * v).alias(f"__sumsq_{c}"),
        ]

    # timestamp → long = floor to epoch seconds (UTC session pinned by the
    # engine), then to the bucket width. One second is the reference's finest
    # dimension; coarser bases shrink the collected rollup proportionally.
    sec = F.col(time_column).cast("long")
    if bucket_seconds != 1:
        sec = sec - (sec % bucket_seconds)
    rolled = g.groupBy(sec.alias("__sec")).agg(*aggs)
    if backend == "spark":
        return _spark_wheels_from_rollup(
            rolled, table, columns, filter_key,
            complete=time_range is None, bucket_seconds=bucket_seconds,
        )
    pdf = rolled.toPandas()
    return _indices_from_rollup(
        pdf, table, columns, filter_key, complete=time_range is None,
        bucket_seconds=bucket_seconds,
    )


def _spark_wheels_from_rollup(
    rolled: DataFrame,
    table: str,
    columns: Sequence[str],
    filter_key: str,
    complete: bool,
    bucket_seconds: int,
):
    from .rollup_table import SparkRollupWheel

    # Each wheel persists its own column-pruned projection (count wheel:
    # 2 columns; value wheels: 6) — persisting the parent here too would
    # double-cache every rollup row in executor memory.
    bounds = rolled.agg(F.min("__tmin"), F.max("__tmax")).collect()[0]
    if bounds[0] is None:  # empty source
        min_us, max_us = 0, -1
    else:
        min_us, max_us = int(bounds[0]), int(bounds[1])
    out = {
        None: SparkRollupWheel(
            rolled.select("__sec", "__cnt"),
            table, None, filter_key, min_us, max_us, complete, bucket_seconds,
        )
    }
    for c in columns:
        out[c] = SparkRollupWheel(
            rolled.select(
                "__sec", "__cnt",
                F.col(f"__sum_{c}").alias("__sum"),
                F.col(f"__min_{c}").alias("__min"),
                F.col(f"__max_{c}").alias("__max"),
                F.col(f"__sumsq_{c}").alias("__sumsq"),
            ),
            table, c, filter_key, min_us, max_us, complete, bucket_seconds,
        )
    return out


def _indices_from_rollup(
    pdf: pd.DataFrame,
    table: str,
    columns: Sequence[str],
    filter_key: str,
    complete: bool = False,
    bucket_seconds: int = 1,
) -> dict[str | None, WheelIndex]:
    if len(pdf) == 0:
        empty = np.empty(0, dtype=np.int64)
        out: dict[str | None, WheelIndex] = {
            None: WheelIndex(
                table, None, filter_key, empty, empty.copy(),
                complete=complete, bucket_seconds=bucket_seconds,
            )
        }
        for c in columns:
            out[c] = WheelIndex(
                table, c, filter_key, empty, empty.copy(),
                np.empty(0), np.empty(0), np.empty(0), np.empty(0),
                complete=complete, bucket_seconds=bucket_seconds,
            )
        return out

    order = np.argsort(pdf["__sec"].to_numpy())
    secs = pdf["__sec"].to_numpy(dtype=np.int64)[order]
    cnt = pdf["__cnt"].to_numpy(dtype=np.int64)[order]
    min_ts_us = int(pdf["__tmin"].min())
    max_ts_us = int(pdf["__tmax"].max())

    out = {
        None: WheelIndex(
            table, None, filter_key, secs, cnt,
            min_ts_us=min_ts_us, max_ts_us=max_ts_us,
            complete=complete, bucket_seconds=bucket_seconds,
        )
    }
    for c in columns:
        out[c] = WheelIndex(
            table,
            c,
            filter_key,
            secs,
            cnt,
            sum_=pdf[f"__sum_{c}"].to_numpy(dtype=np.float64)[order],
            min_=pdf[f"__min_{c}"].to_numpy(dtype=np.float64)[order],
            max_=pdf[f"__max_{c}"].to_numpy(dtype=np.float64)[order],
            sumsq_=pdf[f"__sumsq_{c}"].to_numpy(dtype=np.float64)[order],
            min_ts_us=min_ts_us,
            max_ts_us=max_ts_us,
            complete=complete,
            bucket_seconds=bucket_seconds,
        )
    return out


def build_wheel_index(
    df: DataFrame,
    table: str,
    time_column: str,
    column: str,
    filter_expr: Column | str | None = None,
    filter_key: str = STAR_AGGREGATION_ALIAS,
    time_range: tuple | None = None,
) -> WheelIndex:
    """Single-column convenience wrapper (reference ``build_index``,
    ``lib.rs:153-239``)."""
    return build_wheel_indices(
        df, table, time_column, [column], filter_expr, filter_key, time_range
    )[column]


def rollup_dataframe(
    df: DataFrame, time_column: str, granularity_col: str = "__sec"
) -> DataFrame:
    """Expose the raw rollup as a DataFrame (for persistence / streaming
    maintenance): ``(second, count)`` without collecting."""
    return df.groupBy(F.col(time_column).cast("long").alias(granularity_col)).agg(
        F.count(F.lit(1)).alias("cnt")
    )
