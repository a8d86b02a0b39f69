"""Driver-side wheel index: the Spark-native analogue of a µWheel HAW.

The reference builds a Hierarchical Aggregate Wheel per
``(table, column, aggregate, filter)`` and answers arbitrary-range temporal
aggregates at plan time (reference ``datafusion-uwheel/src/lib.rs:1019-1127``,
``wheels.rs:19-76``). Our analogue: a **sparse second-granularity rollup**
collected to the driver as numpy arrays (sorted distinct epoch-seconds plus
per-bucket partial aggregate states), with range queries answered by binary
search + vectorized reduction and ``date_trunc`` group-bys answered by
segmented reduction. Coarser granularities (minute/hour/day/week) never need
separate storage — they are derived views over the second dimension, which
matches the reference's retention-``Keep`` configuration (all dimensions
answerable, ``builder.rs:99-112``) at strictly lower memory cost because we
only store *occupied* buckets.

Scale note (100 TB): the index size is bounded by the number of **distinct
seconds in the time span** (~31.5M/year) × a few ``int64``/``float64`` states,
independent of row count. Only the rollup is ever collected to the driver —
never raw rows (SURVEY.md §7.3.5). For multi-year spans, restrict with
``time_range`` at build (the reference's ``with_time_range``,
``builder.rs:177-191``).

Correctness notes:

* AVG state is a ``(sum, count)`` pair, divided only at answer time —
  never an average of averages (reference ``lib.rs:700-703``).
* COUNT is ``int64`` end to end (the reference keeps ``u32`` wheels and
  emits ``i64``, an overflow hazard at >4.29B rows — SURVEY.md §4.3.3).
* Range sums use vectorized slice reduction (numpy pairwise summation), not
  prefix-difference, to avoid catastrophic cancellation against the DuckDB
  oracle; COUNT uses an exact integer prefix array (O(1) lookups, the
  analogue of the reference's prefix wheels, ``lib.rs:1085-1087``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..functions.timestamps import (
    CALENDAR_GRANULARITIES,
    GRANULARITY_SECONDS,
    MICROS_PER_SECOND,
    bucket_starts,
)

__all__ = ["WheelIndex", "STAR_AGGREGATION_ALIAS"]

#: Key suffix for unfiltered indices — mirrors ``STAR_AGGREGATION_ALIAS``
#: (reference ``lib.rs:70``).
STAR_AGGREGATION_ALIAS = "*_AGG"


def _variance_states(s: float | None, sq: float | None, n: int) -> dict:
    """Derived VAR/STDDEV from (sum, sumsq, count) monoid states.

    Two-pass formula ``E[x²] − E[x]²`` (clamped at 0 against cancellation);
    SQL semantics: sample variants NULL for n < 2, population variants 0 for
    n = 1. Results are rounded by callers against the oracle (DuckDB's
    streaming algorithm differs in low-order bits)."""
    if n == 0 or s is None or sq is None:
        return {k: None for k in ("var_pop", "var_samp", "stddev_pop", "stddev_samp")}
    mean = s / n
    m2 = max(sq - n * mean * mean, 0.0)  # Σ(x−mean)²
    var_pop = m2 / n
    out = {"var_pop": var_pop, "stddev_pop": var_pop**0.5}
    if n >= 2:
        var_samp = m2 / (n - 1)
        out["var_samp"] = var_samp
        out["stddev_samp"] = var_samp**0.5
    else:
        out["var_samp"] = None
        out["stddev_samp"] = None
    return out


@dataclass
class WheelIndex:
    """One wheel: partial aggregates per occupied epoch-second bucket.

    Parameters
    ----------
    table, column:
        Identity; ``column is None`` for the COUNT(*) wheel.
    filter_key:
        Canonical filter string for keyed indices (reference key format
        ``"{table}.{column}.{expr}"``, ``lib.rs:164-173``), else
        :data:`STAR_AGGREGATION_ALIAS`.
    secs:
        Sorted distinct epoch-seconds with ≥1 row (``int64``).
    cnt / sum_ / min_ / max_:
        Per-bucket partial states aligned with ``secs``. ``sum_``/``min_``/
        ``max_`` are ``None`` for the pure COUNT wheel.
    min_ts_us / max_ts_us:
        Exact data bounds (epoch µs) — the reference's
        ``min_timestamp_ms``/``max_timestamp_ms`` (``lib.rs:84-87``), used to
        refuse rewrites outside the indexed range.
    """

    table: str
    column: str | None
    filter_key: str
    secs: np.ndarray
    cnt: np.ndarray
    sum_: np.ndarray | None = None
    min_: np.ndarray | None = None
    max_: np.ndarray | None = None
    #: Sum-of-squares state (optional: absent on wheels persisted before it
    #: existed) — derives VAR/STDDEV at lookup. The extension-point analogue
    #: of the reference's custom ``Aggregator`` impls (aggregator/mod.rs).
    sumsq_: np.ndarray | None = None
    min_ts_us: int = 0
    max_ts_us: int = -1
    #: True when built over the *whole* table (no ``time_range`` restriction):
    #: the index then proves rows outside ``[min_ts, max_ts]`` don't exist, so
    #: ANY exact aligned range is answerable (0/NULL beyond the span). The
    #: reference always refuses such ranges (``lib.rs:1498-1518``) because a
    #: HAW can't distinguish "no data" from "not indexed" — our rollup can.
    #: ``time_range``-restricted builds keep the strict reference gate.
    complete: bool = False
    #: Width of one bucket in seconds (1 = the reference's finest HAW
    #: dimension). Coarser bases (60 = minute, 3600 = hour) shrink the
    #: driver-side index by the same factor — the scale lever for multi-year
    #: tables; the router only routes ranges aligned to this width.
    bucket_seconds: int = 1
    _pcnt: np.ndarray = field(init=False, repr=False, default=None)
    _landmark: dict[str, Any] | None = field(init=False, repr=False, default=None)

    def __post_init__(self) -> None:
        self.secs = np.asarray(self.secs, dtype=np.int64)
        self.cnt = np.asarray(self.cnt, dtype=np.int64)
        # Exact O(1) COUNT ranges — prefix wheel analogue (lib.rs:1085-1087).
        self._pcnt = np.concatenate([[0], np.cumsum(self.cnt)])

    # ------------------------------------------------------------------ keys
    @property
    def key(self) -> str:
        col = self.column if self.column is not None else "*"
        return f"{self.table}.{col}.{self.filter_key}"

    @property
    def empty(self) -> bool:
        return self.secs.size == 0

    # ------------------------------------------------------- range validity
    @property
    def low_sec(self) -> int:
        """Watermark start = min timestamp floored to the bucket width
        (lib.rs:976,1106; seconds in the reference)."""
        s = self.min_ts_us // MICROS_PER_SECOND
        return s - (s % self.bucket_seconds)

    @property
    def high_sec_exclusive(self) -> int:
        """One bucket past the last data point — the reference advances the
        wheel to ``max + 1s`` so the final second stays queryable
        (``advance_to(end+1000)``, ``lib.rs:1080,1120``)."""
        s = self.max_ts_us // MICROS_PER_SECOND
        return s - (s % self.bucket_seconds) + self.bucket_seconds

    def covers(self, start_sec: int, end_sec: int) -> bool:
        """Whether the wheel can answer ``[start_sec, end_sec)`` — outside
        ranges must fall through, mirroring ``combine_range_and_lower``
        returning ``None`` (``lib.rs:663-688``; test ``lib.rs:1498-1518``).
        Ranges not aligned to the bucket width are unanswerable (a minute
        wheel cannot split a bucket at second precision)."""
        if start_sec > end_sec:
            return False
        if start_sec % self.bucket_seconds or end_sec % self.bucket_seconds:
            return False
        if self.complete:
            return True
        if self.empty:
            return False
        return start_sec >= self.low_sec and end_sec <= self.high_sec_exclusive

    # ------------------------------------------------------------- queries
    def _slice(self, start_sec: int, end_sec: int) -> tuple[int, int]:
        i = int(np.searchsorted(self.secs, start_sec, side="left"))
        j = int(np.searchsorted(self.secs, end_sec, side="left"))
        return i, j

    def count_range(self, start_sec: int, end_sec: int) -> int | None:
        """COUNT over ``[start, end)`` — O(log n) via the integer prefix array."""
        if not self.covers(start_sec, end_sec):
            return None
        i, j = self._slice(start_sec, end_sec)
        return int(self._pcnt[j] - self._pcnt[i])

    def combine_range(self, start_sec: int, end_sec: int) -> dict[str, Any] | None:
        """All available aggregate states over ``[start, end)``.

        Returns ``{"count": int, "sum": float|None, "min": ..., "max": ...,
        "avg": ...}`` (value states only when the wheel carries a column);
        SQL semantics — empty input ⇒ NULL aggregates, COUNT ⇒ 0. Returns
        ``None`` when the range is not covered (rewrite must fall through).
        """
        if not self.covers(start_sec, end_sec):
            return None
        i, j = self._slice(start_sec, end_sec)
        n = int(self._pcnt[j] - self._pcnt[i])
        out: dict[str, Any] = {"count": n}
        if self.sum_ is not None:
            if n == 0:
                out.update({"sum": None, "min": None, "max": None, "avg": None})
                out.update(_variance_states(None, None, 0))
            else:
                s = float(np.sum(self.sum_[i:j]))
                out["sum"] = s
                out["min"] = float(np.min(self.min_[i:j]))
                out["max"] = float(np.max(self.max_[i:j]))
                out["avg"] = s / n
                sq = float(np.sum(self.sumsq_[i:j])) if self.sumsq_ is not None else None
                out.update(_variance_states(s, sq, n))
        return out

    def landmark(self) -> dict[str, Any]:
        """Aggregate over *all* indexed data — the reference's ``landmark()``
        path (``lib.rs:690-714``)."""
        if self._landmark is None:
            n = int(self._pcnt[-1])
            lm: dict[str, Any] = {"count": n}
            if self.sum_ is not None:
                if n == 0:
                    lm.update({"sum": None, "min": None, "max": None, "avg": None})
                    lm.update(_variance_states(None, None, 0))
                else:
                    s = float(np.sum(self.sum_))
                    lm.update(
                        {
                            "sum": s,
                            "min": float(np.min(self.min_)),
                            "max": float(np.max(self.max_)),
                            "avg": s / n,
                        }
                    )
                    sq = float(np.sum(self.sumsq_)) if self.sumsq_ is not None else None
                    lm.update(_variance_states(s, sq, n))
            self._landmark = lm
        return self._landmark

    def group_by(
        self, start_sec: int, end_sec: int, granularity: str
    ) -> list[tuple[int, dict[str, Any]]] | None:
        """``GROUP BY date_trunc(granularity, ts)`` over ``[start, end)``.

        Reference: per-granularity ``wheel.group_by(range, duration)``
        (``lib.rs:396-482``). Returns ``[(bucket_start_sec, states), ...]``
        for **occupied** buckets only (SQL group-by emits no empty groups),
        in ascending bucket order. Segmented numpy reduction — no per-bucket
        Python loop over seconds.
        """
        if granularity in CALENDAR_GRANULARITIES:
            # month/year boundaries are day-aligned — any bucket width that
            # divides a day nests exactly (beyond the reference, which
            # refuses calendar granularities outright, lib.rs:348-358).
            if 86_400 % self.bucket_seconds:
                return None
        elif granularity in GRANULARITY_SECONDS:
            if GRANULARITY_SECONDS[granularity] % self.bucket_seconds:
                return None  # coarse wheel can't split its buckets finer
        else:
            return None
        if not self.covers(start_sec, end_sec):
            return None
        i, j = self._slice(start_sec, end_sec)
        if i == j:
            return []
        bucket_ids = bucket_starts(self.secs[i:j], granularity)
        # Boundaries where the bucket id changes → segment starts.
        seg = np.flatnonzero(np.r_[True, bucket_ids[1:] != bucket_ids[:-1]])
        keys = bucket_ids[seg]
        counts = np.add.reduceat(self.cnt[i:j], seg)
        rows: list[tuple[int, dict[str, Any]]] = []
        if self.sum_ is not None:
            sums = np.add.reduceat(self.sum_[i:j], seg)
            mins = np.minimum.reduceat(self.min_[i:j], seg)
            maxs = np.maximum.reduceat(self.max_[i:j], seg)
            sqs = (
                np.add.reduceat(self.sumsq_[i:j], seg)
                if self.sumsq_ is not None
                else None
            )
            for k in range(keys.size):
                n = int(counts[k])
                states = {
                    "count": n,
                    "sum": float(sums[k]),
                    "min": float(mins[k]),
                    "max": float(maxs[k]),
                    "avg": float(sums[k]) / n,
                }
                states.update(
                    _variance_states(
                        float(sums[k]), float(sqs[k]) if sqs is not None else None, n
                    )
                )
                rows.append((int(keys[k]), states))
        else:
            for k in range(keys.size):
                rows.append((int(keys[k]), {"count": int(counts[k])}))
        return rows

    # ----------------------------------------------------------- min/max
    def min_max_range(self, start_sec: int, end_sec: int) -> tuple[float, float] | None:
        """(min, max) of the indexed column over the range, for scan pruning
        (reference ``maybe_min_max_filter``, ``lib.rs:621-649``). ``None``
        when uncovered or when the range holds no rows — note the reference's
        ``is_empty_range`` treats a zero-row range as prunable via the COUNT
        path, not this one."""
        if self.min_ is None or not self.covers(start_sec, end_sec):
            return None
        i, j = self._slice(start_sec, end_sec)
        if i == j:
            return None
        return float(np.min(self.min_[i:j])), float(np.max(self.max_[i:j]))

    # -------------------------------------------------------- maintenance
    def merge_delta(
        self,
        secs: np.ndarray,
        cnt: np.ndarray,
        sum_: np.ndarray | None = None,
        min_: np.ndarray | None = None,
        max_: np.ndarray | None = None,
        sumsq_: np.ndarray | None = None,
        min_ts_us: int | None = None,
        max_ts_us: int | None = None,
    ) -> None:
        """Merge a per-second partial-aggregate delta into the wheel.

        The streaming-maintenance primitive (the reference's µWheel is
        streaming-native but the crate only ``advance_to``'s once at build —
        SURVEY.md §M7 upgrades that with Structured Streaming). All states
        are commutative monoids (count/sum add, min/max combine), so merges
        are order-independent and late data needs no special casing.
        """
        secs = np.asarray(secs, dtype=np.int64)
        if secs.size == 0:
            return
        order = np.argsort(secs)
        secs = secs[order]
        cnt = np.asarray(cnt, dtype=np.int64)[order]
        merged_secs = np.union1d(self.secs, secs)
        old_pos = np.searchsorted(merged_secs, self.secs)
        new_pos = np.searchsorted(merged_secs, secs)

        def scatter(old, new, fill, combine):
            out = np.full(merged_secs.shape, fill, dtype=old.dtype if old is not None else new.dtype)
            if old is not None and old.size:
                out[old_pos] = old
            if combine == "add":
                np.add.at(out, new_pos, new)
            elif combine == "min":
                np.minimum.at(out, new_pos, new)
            else:
                np.maximum.at(out, new_pos, new)
            return out

        new_cnt = scatter(self.cnt, cnt, 0, "add")
        if self.sum_ is not None:
            s = np.asarray(sum_, dtype=np.float64)[order]
            mn = np.asarray(min_, dtype=np.float64)[order]
            mx = np.asarray(max_, dtype=np.float64)[order]
            self.sum_ = scatter(self.sum_, s, 0.0, "add")
            self.min_ = scatter(self.min_, mn, np.inf, "min")
            self.max_ = scatter(self.max_, mx, -np.inf, "max")
            if self.sumsq_ is not None and sumsq_ is not None:
                sq = np.asarray(sumsq_, dtype=np.float64)[order]
                self.sumsq_ = scatter(self.sumsq_, sq, 0.0, "add")
            else:
                self.sumsq_ = None  # state lost — stop deriving variance
        was_empty = self.empty
        self.secs = merged_secs
        self.cnt = new_cnt
        if min_ts_us is not None:
            self.min_ts_us = min_ts_us if was_empty else min(self.min_ts_us, min_ts_us)
        if max_ts_us is not None:
            self.max_ts_us = max_ts_us if was_empty else max(self.max_ts_us, max_ts_us)
        # Invalidate derived structures.
        self._pcnt = np.concatenate([[0], np.cumsum(self.cnt)])
        self._landmark = None

    # ------------------------------------------------------- introspection
    def size_bytes(self) -> int:
        """Analogue of ``BuiltInWheels::size_bytes`` (``wheels.rs:53-75``)."""
        total = self.secs.nbytes + self.cnt.nbytes + self._pcnt.nbytes
        for a in (self.sum_, self.min_, self.max_, self.sumsq_):
            if a is not None:
                total += a.nbytes
        return total
