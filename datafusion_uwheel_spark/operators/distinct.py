"""Approximate-distinct rollup: a wheel of mergeable HLL sketches.

The reference exposes a custom-aggregator extension point
(``UWheelAggregate`` variants, ``datafusion-uwheel/src/index/mod.rs:7-21``);
this module applies it to a state the driver-side numpy wheels cannot hold:
**per-bucket HyperLogLog sketches** (Spark 3.5+ DataSketches —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``, all
JVM-side). COUNT DISTINCT over a time range is not a scalar monoid — it
needs a mergeable sketch per bucket — so the rollup lives as a **cached
DataFrame** (the ``index_backend="spark"`` shape, ~KB per bucket) and a
range query is a tiny union-and-estimate job over the selected buckets
instead of a scan of the raw table.

Scale: the rollup is bounded by distinct buckets × sketch size (lgK=12 →
≤4 KB each), not rows; a year of hourly buckets is ~35 MB of executor cache.
Query cost is O(buckets in range) regardless of table size — the wheel trade
applied to distinct counts. Error is the standard HLL bound (~1.6% rel. at
lgK=12; raise ``lg_k`` for tighter estimates).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollups import time_sec_col
from .sketch_retention import SketchRetention

__all__ = [
    "DistinctRollup",
    "build_distinct_rollup",
    "build_distinct_rollups",
    "load_distinct_rollup",
]

_META = "_distinct_meta.json"
#: Cached-rollup partition count — small enough that probes run at the
#: task-launch floor (the shuffle-partition default made every estimate
#: schedule ~33 tasks), large enough to parallelize a multi-year rollup.
_CACHE_PARTITIONS = 4


class DistinctRollup(SketchRetention):
    """Handle over a cached per-bucket HLL sketch table.

    ``approx_distinct(a, b)`` answers ``COUNT(DISTINCT col)`` over
    ``[a, b)`` (second-aligned bounds, like every wheel lookup) by merging
    the bucket sketches — one tiny Spark job over the cached rollup."""

    def __init__(
        self,
        rollup: DataFrame,
        column: str,
        bucket_seconds: int,
        lg_k: int,
        key_column: str | None = None,
    ):
        self._df = rollup
        self.column = column
        self.bucket_seconds = bucket_seconds
        self.lg_k = lg_k
        #: Optional partition key: sketches per (bucket, key value) — the
        #: partitioned-wheel-family idea applied to distinct state. Unkeyed
        #: asks on a keyed rollup union across keys (HLL union is exact
        #: sketch algebra, and idempotent, so shared values don't
        #: double-count).
        self.key_column = key_column

    #: sentinel for "no key restriction" (None is a real NULL-key ask) —
    #: the SAME object as the base gate's _NO_ASK, so the direct branch
    #: passes keys through verbatim (r11 review: two parallel sentinels
    #: for one concept forced a translation at every call site)
    _NO_KEY = SketchRetention._NO_ASK

    def _restrict(self, start, end, key=_NO_KEY):
        df = self._df.filter(self._range_filter(start, end))
        if key is not DistinctRollup._NO_KEY:
            if self.key_column is None:
                raise ValueError(
                    "rollup was built without partition_by — no key column"
                )
            df = df.filter(F.col("__key").eqNullSafe(F.lit(key)))
        return df

    def _jvm_merge_grouped(self, ops):
        """Day-tier pre-merge (r12): HLL register/coupon union is
        associative, so the tier's final REGISTER STATE is identical to a
        flat union of the raw frames — and the estimate is exact-equal in
        the coupon regime. Beyond it the estimate can differ within the
        published bound, because estimator SELECTION is path-dependent
        (a day merge that promotes coupons to HLL mode makes the ask-time
        union composite where the flat union could stay HIP) — the SAME
        documented direct-vs-job contract (r11 probe: six update orders
        of one real day's sketches → six estimates in [1318, 1330])."""
        return ops.hllMergeGrouped

    def _range_filter(self, start, end):
        """Bucket filter covering ``[start, end)``: a bucket ``[s, s+w)``
        intersects the range iff ``s > a - w`` and ``s < b`` — so partial
        edge buckets on BOTH sides are included whole (superset semantics;
        estimates never undercount against unaligned bounds)."""
        a = F.unix_timestamp(F.lit(start).cast("timestamp"))
        b = F.unix_timestamp(F.lit(end).cast("timestamp"))
        # per-row width: compacted (coarser) buckets widen the slop so a
        # coarse bucket spanning the range start is still included whole
        return (F.col("__sec") > a - self._width_expr()) & (
            F.col("__sec") < b
        )

    def approx_distinct(self, start, end, key=_NO_KEY) -> int:
        """Estimated distinct count of ``column`` in ``[start, end)``
        (timestamp strings or datetimes). Buckets partially covered at the
        edges are included whole — align bounds to ``bucket_seconds`` for
        exact range semantics (unaligned asks should delegate to a scan,
        the wheel discipline). On a keyed rollup, ``key=value`` restricts
        to one partition value (NULL-safe); omitting it unions across
        keys. Repeated asks are memoized until the rollup mutates (see
        :meth:`..sketch_retention.SketchRetention._memoized_ask` — the
        sketch MERGE stays a JVM job; only the answer is remembered)."""
        self._require_fresh()

        def compute() -> int:
            # direct path (r10; keyed since r11): asks with
            # job-equivalent bounds answer from the driver mirror through
            # ONE py4j call into the same datasketches-java classes
            # hll_union_agg uses — zero Spark jobs. Parity vs the job
            # path is EXACT in the coupon-exact regime (small per-bucket
            # cardinalities); beyond it both paths return valid HLL
            # estimates that can differ within the bound, because the
            # union's HIP estimator is UPDATE-ORDER-dependent and the
            # job's aggregation order is arbitrary (probe-pinned r11: six
            # update orders of one real day's sketches → six estimates in
            # [1318, 1330] of a true ~1330). Keyed asks ride only under
            # the SAME-TYPE gate (_key_gate); cross-type coercion, exotic
            # bounds, and the no-key-column raise stay on the job path
            fr = self._direct_frame("__hll", start, end, key)
            if fr is not None:
                framed, n = fr
                return int(self._sketch_ops().hllEstimate(framed)) if n else 0
            row = (
                self._restrict(start, end, key)
                .agg(F.hll_sketch_estimate(F.hll_union_agg("__hll")).alias("est"))
                .collect()[0]
            )
            return int(row["est"] or 0)

        return self._memoized_ask(
            # the key component is type-tagged too: F.lit(key) is
            # type-sensitive (True vs 1 cast a string key column through
            # DIFFERENT grammars) while Python's dict hash says True == 1
            ("distinct", self._ask_token(start), self._ask_token(end),
             self._ask_token(key)),
            compute,
        )

    def approx_distinct_by_key(self, start=None, end=None) -> DataFrame:
        """Per-key distinct estimates over an optional ``[start, end)``
        restriction — the dimensional form (distinct users per segment).
        Requires a keyed build (``partition_by=``). Returns
        ``(<key_column>, approx_distinct)`` ordered by key (NULL keys
        included); one tiny job over the cached sketch table."""
        self._require_fresh()
        if self.key_column is None:
            raise ValueError(
                "rollup was built without partition_by — no key column"
            )
        df = self._df
        if start is not None or end is not None:
            df = df.filter(
                self._range_filter(start or "1970-01-01", end or "9999-01-01")
            )
        return (
            df.groupBy(F.col("__key").alias(self.key_column))
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("__hll"))
                .cast("long")
                .alias("approx_distinct")
            )
            .orderBy(self.key_column)
        )

    def approx_distinct_by(
        self, granularity, start=None, end=None
    ) -> DataFrame:
        """Per-bucket ``COUNT(DISTINCT col)`` estimates — the group-by form
        of :meth:`approx_distinct`: ``GROUP BY date_trunc('<granularity>')``
        for a named granularity, or epoch-aligned tumbling windows for an
        integer width in seconds (the ``window(ts, w)`` shape). Returns
        ``(bucket TIMESTAMP, approx_distinct BIGINT)`` for occupied buckets;
        one tiny job over the cached sketch table, O(stored buckets)
        regardless of table size. Optional ``[start, end)`` restriction with
        the same both-edges-whole coverage as the range estimate.

        Sketches are monoids, so regrouping the fine buckets under any
        coarser bucketing is exact sketch algebra — no rescan, no second
        rollup build."""
        self._require_fresh()
        ts = F.timestamp_seconds(F.col("__sec"))
        self._check_granularity(granularity, start)
        if isinstance(granularity, int):
            bucket = F.timestamp_seconds(
                F.col("__sec") - F.col("__sec") % F.lit(granularity)
            )
        else:
            bucket = F.date_trunc(str(granularity), ts)
        df = self._df
        if start is not None or end is not None:
            df = df.filter(
                self._range_filter(start or "1970-01-01", end or "9999-01-01")
            )
        return (
            df.groupBy(bucket.alias("bucket"))
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("__hll"))
                .cast("long")
                .alias("approx_distinct")
            )
            .orderBy("bucket")
        )

    def distinct_rows_by_key(self, start=None, end=None) -> list[tuple]:
        """Driver-resident sibling of :meth:`approx_distinct_by_key` (r11):
        the same ``(<key_column>, approx_distinct)`` rows as plain Python
        tuples, key-ascending with NULL first (the job path's ORDER BY),
        ZERO Spark jobs on a shim session — one batched py4j call merges
        every key's sketches. Keys outside the same-type sortable set
        (string/integral), shim-less sessions, and unresolvable bounds
        fall back to collecting the job path's DataFrame. Memoized until
        the rollup mutates. Estimate-regime caveat as
        :meth:`distinct_rows_by`."""
        self._require_fresh()
        if self.key_column is None:
            raise ValueError(
                "rollup was built without partition_by — no key column"
            )

        def compute() -> list[tuple]:
            gc = self._keyed_cells("__hll", start, end)
            if gc is None:
                return [
                    tuple(r)
                    for r in self.approx_distinct_by_key(start, end).collect()
                ]
            cells, framed, counts = gc
            if not cells:
                return []
            import struct

            ests = struct.unpack(
                f">{len(cells)}q",
                bytes(self._sketch_ops().hllEstimateGrouped(framed)),
            )
            return [
                (k, int(e) if c else None)
                for k, e, c in zip(cells, ests, counts)
            ]

        return self._memoized_ask(
            ("distinct_by_key", self._ask_token(start), self._ask_token(end)),
            compute,
        )

    def distinct_rows_by(self, granularity, start=None, end=None) -> list[tuple]:
        """Driver-resident sibling of :meth:`approx_distinct_by` (r11 —
        the frequency family's ``topk_rows_by`` model applied to the
        dashboard-series sketch asks): the same ``(bucket,
        approx_distinct)`` rows as plain Python tuples (bucket = naive-UTC
        datetime, matching the job path's collected TIMESTAMPs) with ZERO
        Spark jobs on a shim session — the whole series merges in ONE
        py4j call (``UwheelSketchOps.hllEstimateGrouped`` over the framed
        driver mirror). Buckets whose sketches were all NULL surface with
        ``None``, mirroring the job path's NULL estimate. Values equal
        the job path's exactly in the coupon-exact regime; at real
        cardinalities both are valid estimates within the HLL bound (the
        HIP estimator is update-order-dependent — see approx_distinct). Falls back to
        collecting the job path's DataFrame when the direct gate refuses
        (exotic date_trunc level, unresolvable bounds, keyed-session
        quirks, over-cap mirror, shim-less session) — identical rows
        either way. Memoized until the rollup mutates."""
        self._require_fresh()

        def compute() -> list[tuple]:
            # validation must raise identically on BOTH paths
            self._check_granularity(granularity, start)
            gc = self._grouped_cells("__hll", granularity, start, end)
            if gc is None:
                return [
                    tuple(r)
                    for r in self.approx_distinct_by(
                        granularity, start, end
                    ).collect()
                ]
            cells, framed, counts = gc
            if not cells:
                return []
            import struct

            # packed int64s back (one bulk transfer — see _grouped_cells)
            ests = struct.unpack(
                f">{len(cells)}q",
                bytes(self._sketch_ops().hllEstimateGrouped(framed)),
            )
            return [
                (self._bucket_dt(bk), int(e) if c else None)
                for bk, e, c in zip(cells, ests, counts)
            ]

        return self._memoized_ask(
            (
                "distinct_by",
                self._ask_token(granularity),
                self._ask_token(start),
                self._ask_token(end),
            ),
            compute,
        )

    def merged_sketch(self, start, end) -> bytes | None:
        """The merged HLL sketch bytes for ``[start, end)`` — composable
        with sketches from other tables/partitions (union-merge downstream,
        e.g. cross-dataset dedup accounting). Same both-edges-whole bucket
        coverage as :meth:`approx_distinct`. Memoized like it."""
        self._require_fresh()

        def compute() -> bytes | None:
            row = (
                self._df.filter(self._range_filter(start, end))
                .agg(F.hll_union_agg("__hll").alias("sk"))
                .collect()[0]
            )
            return bytes(row["sk"]) if row["sk"] is not None else None

        return self._memoized_ask(
            ("sketch", self._ask_token(start), self._ask_token(end)), compute
        )

    def _union_agg_exprs(self):
        """Merge aggregation for :meth:`SketchRetention.compact_before` —
        HLL union is exact sketch algebra."""
        return [F.hll_union_agg("__hll").alias("__hll")]

    def _merge_batch_locked(self, batch_df, time_column, StorageLevel) -> None:
        """Merge a micro-batch of raw rows into the rollup — streaming
        maintenance. HLL sketches are mergeable monoids, so the merged
        rollup is indistinguishable from a fresh batch build over the union
        (the same model as the wheel maintainers): the batch is sketched
        per bucket with the pinned ``lg_k``, unioned with the stored
        sketches, and re-merged by bucket with ``hll_union_agg``. Late data
        simply lands in its bucket. The new rollup is materialized before
        the old cache is released."""

        sec = self._bucket_expr(time_sec_col(batch_df, time_column))
        keys = [sec.alias("__sec")]
        if self.key_column is not None:
            if self.key_column not in batch_df.columns:
                raise ValueError(
                    f"batch lacks partition column {self.key_column!r} — a "
                    "keyed rollup cannot be maintained without it"
                )
            keys.append(F.col(self.key_column).alias("__key"))
        delta = (
            batch_df.filter(F.col(time_column).isNotNull())
            .groupBy(*keys)
            .agg(F.hll_sketch_agg(F.col(self.column), F.lit(self.lg_k)).alias("__hll"))
        )
        group = ["__sec"] + (["__key"] if self.key_column is not None else [])
        merged = (
            self._df.unionByName(delta)
            .groupBy(*group)
            .agg(F.hll_union_agg("__hll").alias("__hll"))
            .coalesce(_CACHE_PARTITIONS)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        merged.count()
        old = self._df
        self._df = merged
        # A handle from a one-pass multi-column build shared the parent
        # cache; it now owns a private persisted frame, so drop the claim
        # (the parent is released when the last sibling detaches). Handles
        # with a private frame release exactly the frame being replaced.
        if not self._detach_shared():
            old.unpersist()
        self.invalidate_asks()
        self._drop_mirror()

    def save(self, path: str) -> str:
        """Persist the sketch table as parquet (one distributed write) plus
        a JSON sidecar pinning column/bucket/lg_k — without this a restart
        silently loses the rollup and every estimate pays a rebuild scan.
        Reload with :func:`load_distinct_rollup`."""
        self._df.write.mode("overwrite").parquet(path)
        with open(os.path.join(path, _META), "w") as f:
            json.dump(
                {
                    "column": self.column,
                    "bucket_seconds": self.bucket_seconds,
                    "lg_k": self.lg_k,
                    "key_column": self.key_column,
                    **self._persist_meta(),
                },
                f,
            )
        return path

    def unpersist(self) -> None:
        # release the storage that actually holds the sketches: the shared
        # one-pass parent (refcounted across sibling handles) or this
        # handle's private frame
        if not self._detach_shared():
            self._df.unpersist()


def build_distinct_rollup(
    df: DataFrame,
    time_column: str,
    column: str,
    bucket_seconds: int = 3600,
    lg_k: int = 12,
    partition_by: str | None = None,
) -> DistinctRollup:
    """One declarative aggregation job over the table → per-bucket HLL
    sketches, cached (``MEMORY_AND_DISK``) for probe-many use. Default
    hourly buckets: distinct-count dashboards rarely need finer, and the
    rollup stays ~9 K buckets/year.

    ``partition_by=key`` sketches per ``(bucket, key value)``: per-key
    distinct asks (:meth:`DistinctRollup.approx_distinct_by_key`, ``key=``
    restrictions) come from the same single build, and unkeyed asks still
    work by unioning across keys (HLL union is idempotent, so values seen
    under several keys don't double-count). State grows to buckets ×
    distinct keys — meant for low-cardinality dimensional keys."""
    from pyspark import StorageLevel

    sec = time_sec_col(df, time_column)
    if bucket_seconds != 1:
        sec = sec - (sec % bucket_seconds)
    keys = [sec.alias("__sec")]
    if partition_by is not None:
        keys.append(F.col(partition_by).alias("__key"))
    rollup = (
        df.filter(F.col(time_column).isNotNull())
        .groupBy(*keys)
        .agg(F.hll_sketch_agg(F.col(column), F.lit(lg_k)).alias("__hll"))
        .coalesce(_CACHE_PARTITIONS)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rollup.count()  # materialize once; probes never touch the raw table
    r = DistinctRollup(
        rollup, column, bucket_seconds, lg_k, key_column=partition_by
    )
    r._warm_mirror("__hll")  # zero-job direct asks from the start (r10)
    return r


def build_distinct_rollups(
    df: DataFrame,
    time_column: str,
    columns: list[str] | tuple[str, ...],
    bucket_seconds: int = 3600,
    lg_k: int = 12,
    partition_by: str | None = None,
) -> dict[str, DistinctRollup]:
    """N columns' HLL rollups in ONE table scan (the multi-column one-pass
    discipline applied to sketches): a single group-by aggregates one
    sketch per column per bucket; each handle selects its own column from
    the shared cached frame (``unpersist`` releases the parent)."""
    from pyspark import StorageLevel

    if not columns:
        raise ValueError("columns must be non-empty")
    sec = time_sec_col(df, time_column)
    if bucket_seconds != 1:
        sec = sec - (sec % bucket_seconds)
    keys = [sec.alias("__sec")]
    if partition_by is not None:
        keys.append(F.col(partition_by).alias("__key"))
    combined = (
        df.filter(F.col(time_column).isNotNull())
        .groupBy(*keys)
        .agg(
            *[
                F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"__hll{i}")
                for i, c in enumerate(columns)
            ]
        )
        .coalesce(_CACHE_PARTITIONS)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    combined.count()  # ONE materializing scan for all columns
    out = {}
    #: refcounted shared cache: released when the last sibling handle
    #: unpersists or detaches via merge_batch
    holder = {"df": combined, "refs": len(columns)}
    base_cols = ["__sec"] + (["__key"] if partition_by is not None else [])
    for i, c in enumerate(columns):
        view = combined.select(*base_cols, F.col(f"__hll{i}").alias("__hll"))
        out[c] = DistinctRollup(
            view, c, bucket_seconds, lg_k, key_column=partition_by
        )
        out[c]._shared = holder
    return out


def load_distinct_rollup(spark, path: str) -> DistinctRollup:
    """Inverse of :meth:`DistinctRollup.save`: read the parquet sketch
    table back into executor cache. Estimates are identical after reload —
    the sketches are the state, not a derived view."""
    from pyspark import StorageLevel

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    df = (
        spark.read.parquet(path)
        .coalesce(_CACHE_PARTITIONS)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df.count()
    r = DistinctRollup(
        df,
        meta["column"],
        meta["bucket_seconds"],
        meta["lg_k"],
        key_column=meta.get("key_column"),
    )
    r._restore_meta(meta)
    r._warm_mirror("__hll")  # no-op on stale loads / shim-less sessions
    return r
