"""Streaming wheel-index maintenance (SURVEY.md §7.1 M7).

The reference's µWheel is streaming-native, but the crate only indexes a
static snapshot and ``advance_to``'s once (``lib.rs:1010,1080,1120``) —
indices silently go stale as new data lands. This module closes that gap the
idiomatic-Spark way: a Structured Streaming query aggregates each micro-batch
to per-second partial states (the same single-pass shape as the batch build
in :mod:`..operators.rollups`) and merges them into the driver-side
:class:`..operators.lookup.WheelIndex` via ``foreachBatch``.

Correctness model: every wheel state is a commutative monoid (count/sum add;
min/max combine), so merge order does not matter and **late data is simply
merged when it arrives** — no watermark-drop semantics are imposed on the
index (a watermark on the source stream still bounds any upstream stateful
stages). The merged index is indistinguishable from a fresh batch build over
the union of the data, which is exactly what the test asserts.

Scale: each micro-batch shuffles only its own per-second partials (bounded by
distinct seconds in the batch, not rows); the driver merge is a numpy
union+scatter, microseconds for realistic batch spans.

Scope note: the maintainer keeps the *indexes* fresh. The engine's delegate
path reads whatever the registered table reads — for a parquet-directory
source that's the directory contents at scan time, so register the engine
over the same path the stream appends to (not a frozen DataFrame) if
unrouted queries must also see new data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import WheelEngine
from ..operators.lookup import STAR_AGGREGATION_ALIAS

__all__ = ["StreamingWheelMaintainer"]


class StreamingWheelMaintainer:
    """Keeps a :class:`WheelEngine`'s unfiltered indices fresh from a stream.

    Covers the COUNT wheel, the MIN/MAX pruning wheels, and every
    *unfiltered* aggregate wheel already built on the engine (keyed wheels
    would need the filter re-applied per batch — register them via
    ``filters``, mapping canonical filter key → SQL predicate string).
    """

    def __init__(self, engine: WheelEngine, filters: dict[str, str] | None = None):
        self.engine = engine
        self.filters = filters or {}

    # ------------------------------------------------------------- plumbing
    def columns(self) -> list[str]:
        cols = {c for (c, fk) in self.engine.agg_wheels if fk == STAR_AGGREGATION_ALIAS}
        cols.update(self.engine.min_max_wheels)
        return sorted(cols)

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """``foreachBatch`` hook: batch rows → per-second partials → driver
        merge. Also usable directly for incremental *batch* appends."""
        self._merge_into(batch_df, STAR_AGGREGATION_ALIAS, self.columns())
        for fk, predicate in self.filters.items():
            cols = [c for (c, k) in self.engine.agg_wheels if k == fk]
            self._merge_into(batch_df.filter(predicate), fk, cols)
        # invalidate memoized routed answers — indices just changed
        self.engine.index_epoch += 1

    def _merge_into(self, df: DataFrame, filter_key: str, cols: list[str]) -> None:
        e = self.engine
        tc = e.time_column
        aggs = [
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.unix_micros(F.col(tc))).alias("__tmin"),
            F.max(F.unix_micros(F.col(tc))).alias("__tmax"),
        ]
        for c in cols:
            v = F.col(c).cast("double")
            aggs += [
                F.sum(v).alias(f"__sum_{c}"),
                F.min(v).alias(f"__min_{c}"),
                F.max(v).alias(f"__max_{c}"),
                F.sum(v * v).alias(f"__sumsq_{c}"),
            ]
        sec = F.col(tc).cast("long")
        bs = getattr(e, "bucket_seconds", 1)
        if bs != 1:
            sec = sec - (sec % bs)
        rolled = df.select(tc, *cols).groupBy(sec.alias("__sec")).agg(*aggs)

        targets = []
        cw = e.count_wheels.get(filter_key)
        if cw is not None:
            targets.append((cw, None))
        for c in cols:
            w = e.agg_wheels.get((c, filter_key))
            if w is not None:
                targets.append((w, c))
            mm = e.min_max_wheels.get(c) if filter_key == STAR_AGGREGATION_ALIAS else None
            if mm is not None and mm is not w:
                targets.append((mm, c))

        spark_targets = [t for t in targets if hasattr(t[0], "merge_delta_df")]
        driver_targets = [t for t in targets if not hasattr(t[0], "merge_delta_df")]

        if spark_targets:
            from ..operators.rollup_table import SparkRollupWheel  # noqa: F401

            bounds = rolled.agg(F.min("__tmin"), F.max("__tmax")).collect()[0]
            if bounds[0] is not None:
                tmin_s, tmax_s = int(bounds[0]), int(bounds[1])
                for wheel, col in spark_targets:
                    if col is None or not wheel._has_states:
                        delta = rolled.select("__sec", "__cnt")
                    else:
                        delta = rolled.select(
                            "__sec", "__cnt",
                            F.col(f"__sum_{col}").alias("__sum"),
                            F.col(f"__min_{col}").alias("__min"),
                            F.col(f"__max_{col}").alias("__max"),
                            F.col(f"__sumsq_{col}").alias("__sumsq"),
                        )
                    wheel.merge_delta_df(delta, min_ts_us=tmin_s, max_ts_us=tmax_s)

        if not driver_targets:
            return
        pdf = rolled.toPandas()
        if len(pdf) == 0:
            return
        secs = pdf["__sec"].to_numpy()
        cnt = pdf["__cnt"].to_numpy()
        tmin = int(pdf["__tmin"].min())
        tmax = int(pdf["__tmax"].max())
        for wheel, col in driver_targets:
            if col is None or wheel.sum_ is None:
                wheel.merge_delta(secs, cnt, min_ts_us=tmin, max_ts_us=tmax)
            else:
                wheel.merge_delta(
                    secs,
                    cnt,
                    pdf[f"__sum_{col}"].to_numpy(),
                    pdf[f"__min_{col}"].to_numpy(),
                    pdf[f"__max_{col}"].to_numpy(),
                    pdf[f"__sumsq_{col}"].to_numpy(),
                    min_ts_us=tmin,
                    max_ts_us=tmax,
                )

    # -------------------------------------------------------------- driving
    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str,
        trigger_once: bool = False,
        processing_time: str = "10 seconds",
    ):
        """Start the maintenance query on a streaming DataFrame
        (``readStream`` source). Returns the ``StreamingQuery``."""
        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()
