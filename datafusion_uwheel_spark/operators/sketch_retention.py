"""Tiered HAW retention for the sketch rollups (HLL / KLL / theta).

The wheels gained a retention ladder (``lookup.py`` ``compact_before``,
``rollup_table.py`` for the Spark backend) so no index grows linearly with
timeline span under streaming maintenance — but the sketch rollup tables
(one sketch frame row per bucket, persisted sidecars included) kept
growing O(span / bucket_seconds) forever. Sketches are **union monoids**
(HLL union, KLL merge, theta union are all exact sketch algebra), so the
wheels' ladder applies verbatim: regroup fine buckets older than a cutoff
under a coarser width with one re-aggregation job over the cached rollup,
and the compacted table is indistinguishable from a fresh coarse build
over the same rows — identical estimates for every coarse-aligned ask,
the same error bounds.

Reference model: µWheel's hierarchical wheel tiering (SURVEY §1.3,
``index/mod.rs:168-181`` HawConf — old fine slots drain into coarser
wheels). The mixin mirrors the Spark-backend wheel's ladder discipline
(``rollup_table.py``): a single prefix tier ``[(end_sec, width)]``, widths
must nest, cutoffs only advance.

Gates honored after compaction:

* range filters widen their edge-inclusion slop to the per-row bucket
  width (a coarse bucket spanning the range start must still be included
  whole — superset semantics preserved);
* group-by style asks (``approx_distinct_by`` / ``approx_quantile_by`` /
  ``retention_by``) require the granularity to be tiled by the coarsest
  stored width — coarse buckets cannot be split finer, exactly the wheel
  ``group_by`` discipline (raise, never a silently wrong distribution);
* ``merge_batch`` buckets late rows landing in a compacted span at the
  tier width, keeping row counts bounded and the layout identical to a
  fresh coarse build.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["SketchRetention"]

#: Fixed date_trunc levels in seconds; calendar levels (week and up) have
#: day-aligned boundaries, so day-nesting widths tile them.
_FIXED_GRAN_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}

#: memo-miss sentinel — memoized answers may legitimately be None/0/b""
_MEMO_MISS = object()


class SketchRetention:
    """Mixin adding ``compact_before`` / ``check_compact`` tiered retention
    to a per-bucket sketch rollup.

    Host-class contract: ``self._df`` (cached rollup with ``__sec`` and,
    when keyed, ``__key``), ``self.bucket_seconds``, ``self.key_column``,
    and ``_union_agg_exprs()`` returning the merge aggregation(s) that
    re-bucket the sketch column(s). ``_detach_shared`` is honored when the
    host has one (one-pass multi-column builds)."""

    _SKETCH_CACHE_PARTITIONS = 4

    # ---------------------------------------------------------- freshness
    #: The stale-never-answers discipline, extended from the wheels and
    #: the ANN index to the sketch rollups: when a maintenance batch
    #: cannot be folded in (the stream does not carry the rollup's value
    #: or partition column), the maintainer MARKS the rollup instead of
    #: silently skipping it (answers would quietly miss streamed data) or
    #: raising mid-stream (an AnalysisException/ValueError inside
    #: foreachBatch kills the query). Every ask then refuses until the
    #: operator rebuilds — or explicitly accepts with :meth:`mark_fresh`.
    @property
    def stale(self) -> bool:
        return getattr(self, "_stale_reason", None) is not None

    def mark_stale(self, reason: str) -> None:
        self._stale_reason = reason

    def mark_fresh(self) -> None:
        """Clear the stale mark — after a rebuild over the full data, or
        as an explicit operator decision to serve answers that miss the
        unfolded batches. Never called implicitly: a later complete batch
        cannot repair the rows already missed."""
        self._stale_reason = None

    def _require_fresh(self) -> None:
        reason = getattr(self, "_stale_reason", None)
        if reason is not None:
            raise RuntimeError(
                f"sketch rollup is STALE ({reason}) — rebuild it, or call "
                "mark_fresh() to knowingly serve answers missing streamed "
                "data"
            )

    # ------------------------------------------------------------ ask memo
    #: The frequency rollup answers zero-job from a full driver mirror of
    #: its kept rows (exact integers — numpy can re-aggregate them). The
    #: HLL / KLL / theta states are JVM DataSketches binaries, and merging
    #: them in PYTHON would mean reimplementing the DataSketches wire
    #: formats (datasketches-python is not available here) — a correctness
    #: hazard for zero semantic gain, so THE MERGES STAY JVM. r9 added the
    #: first driver-side economics: an LRU memo (every ask is a pure
    #: function of rollup state + args), ~µs repeats. r10 added the
    #: second: the merges still run in the JVM, but in the DRIVER's JVM —
    #: one py4j call hands the range's sketch bytes to the shim's
    #: UwheelSketchOps (the same bundled datasketches-java classes Spark's
    #: expressions use), so FRESH asks drop from the ~120-300 ms job floor
    #: to ~1-5 ms. See the direct-asks section below.
    _ASK_MEMO_MAX = 256

    @staticmethod
    def _ask_token(v) -> tuple:
        """Type-tagged memo-key component for an ask argument: ``str(v)``
        alone erases the argument's type, so two asks of different types
        that stringify identically but resolve differently (int epoch
        ``100`` vs the string ``'100'`` — `_range_filter` parses strings
        as timestamps but treats ints as epochs) would alias to one
        cached answer. The tag keeps them distinct; unhashable arguments
        still fail later with the clearer coercion error, not at the memo
        lookup (str() is total)."""
        return (type(v).__name__, str(v))

    def _memoized_ask(self, key: tuple, compute):
        """Return the memoized answer for ``key`` or run ``compute`` and
        remember it. NOT a freshness gate — callers still `_require_fresh`
        first. KLL note: merge compaction is randomized, so a memoized
        quantile pins ONE of the adjacent data values repeated live asks
        could alternate between — any memoized answer is a valid answer.
        Concurrency: invalidate_asks swaps in a FRESH dict (readers on the
        old snapshot stay consistent), and every lookup/evict here
        tolerates a concurrent swap/evict (get-with-sentinel,
        pop-with-default) — a dashboard thread racing a streaming merge
        can at worst recompute, never crash or see a half state."""
        memo = getattr(self, "_ask_memo", None)
        if memo is None:
            memo = self._ask_memo = {}
        val = memo.get(key, _MEMO_MISS)
        if val is not _MEMO_MISS:
            memo.pop(key, None)  # LRU touch (dicts iterate in order)
            memo[key] = val
            return val
        val = compute()
        memo[key] = val
        while len(memo) > self._ASK_MEMO_MAX:
            try:
                memo.pop(next(iter(memo)), None)
            except (StopIteration, RuntimeError):
                break
        return val

    def invalidate_asks(self) -> None:
        """Drop memoized answers — called by every mutation (merge_batch,
        compact_before); stale transitions need no invalidation (the data
        under a stale mark never changed, only its completeness)."""
        self._ask_memo = {}

    # --------------------------------------------- shared one-pass storage
    def _detach_shared(self) -> bool:
        """Drop this handle's claim on a one-pass shared parent frame
        (multi-column and cross-family builds), releasing the parent cache
        when the LAST sibling detaches. Returns whether the handle was
        sharing (its own ``_df`` is an unpersisted view). Mutation paths
        call this instead of ``unpersist`` on the frame being replaced —
        the handle then owns a private persisted frame."""
        shared = getattr(self, "_shared", None)
        if shared is None:
            return False
        self._shared = None
        shared["refs"] -= 1
        if shared["refs"] == 0:
            shared["df"].unpersist()
        return True

    # ------------------------------------------------ direct (zero-job) asks
    #: r10: the frequency family's driver-mirror economics extended to the
    #: JVM-sketch families WITHOUT touching sketch wire formats in Python
    #: (the r9 merges-stay-JVM decision stands — they just run in the
    #: DRIVER's JVM now): the rollup's (sec, sketch_bytes) rows live in a
    #: lazy driver mirror, a range ask numpy-slices it exactly like the
    #: job path's _range_filter, and ONE py4j call hands the framed bytes
    #: to the shim's UwheelSketchOps, which merges them with the SAME
    #: bundled datasketches-java classes Spark's own expressions use (call
    #: chains pinned from bytecode — see jvm/UwheelShim.scala). A fresh
    #: sketch ask then costs ~1-5 ms instead of the ~120-300 ms
    #: small-job floor. Sessions without the shim jar on the driver
    #: classpath (e.g. the correctness harness's bare session) fall back
    #: to the job path transparently — answers are identical (probe r10:
    #: exact parity on HLL estimate, KLL quantile/rank, theta i/u/d/e).

    @staticmethod
    def _is_class_not_found(e) -> bool:
        """Whether a py4j exception wraps a genuine java
        ClassNotFoundException/NoClassDefFoundError — inspected by java
        TYPE, never message text (ADVICE r10: the old substring latch was
        DEAD code on the bundled py4j, where absent classes raise
        ``TypeError: 'JavaPackage' object is not callable``)."""
        jexc = getattr(e, "java_exception", None)
        if jexc is None:
            return False
        try:
            return jexc.getClass().getName() in (
                "java.lang.ClassNotFoundException",
                "java.lang.NoClassDefFoundError",
            )
        except Exception:
            return False

    @staticmethod
    def _shim_absent(spark, _cls: str = "io.uwheel.spark.UwheelSketchOps") -> bool:
        """Definitive absence probe: ask the JVM itself, and report absent
        ONLY when BOTH the system classloader (``Class.forName`` — the
        ``spark.driver.extraClassPath`` route ``get_spark`` uses) and the
        py4j handler thread's context classloader (the loader py4j's own
        reflection resolves through — where a ``spark.jars``-delivered
        jar lives in Spark's MutableURLClassLoader) raise a genuine
        ClassNotFoundException (r11 review: a system-loader-only probe
        would misclassify a spark.jars deployment's transient hiccup as
        definitive absence and latch the permanent job-path downgrade
        this probe exists to prevent). Any doubt — unreadable loader,
        non-CNFE error — reads as NOT absent, so the caller warns and
        re-probes instead of latching."""
        try:
            spark._jvm.java.lang.Class.forName(_cls)
            return False
        except Exception as e:
            if not SketchRetention._is_class_not_found(e):
                return False
        try:
            cl = spark._jvm.java.lang.Thread.currentThread().getContextClassLoader()
            if cl is None:
                return False  # cannot confirm -> not definitive
            cl.loadClass(_cls)
            return False
        except Exception as e:
            return SketchRetention._is_class_not_found(e)

    def _sketch_ops(self):
        """The shim's UwheelSketchOps static forwarders, or None when the
        session lacks the jar — resolved ONCE per rollup (py4j class
        lookups are lazy; ping() forces resolution so absence surfaces
        here, never mid-ask)."""
        ops = getattr(self, "_jvm_ops", _MEMO_MISS)
        if ops is _MEMO_MISS:
            spark = None
            try:
                spark = self._df.sparkSession
                # the driver literal math assumes the engine's pinned UTC
                # session (get_spark); a non-UTC session resolves string
                # bounds differently on the job path, so refuse the
                # direct path there (review r10p3). Mutating the session
                # timezone AFTER construction is out of contract
                # engine-wide (session.py: UTC is correctness-critical).
                if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
                    ops = None
                else:
                    jops = spark._jvm.io.uwheel.spark.UwheelSketchOps
                    jops.ping()
                    ops = jops
            except Exception as e:
                # latch None only when the JVM DEFINITIVELY reports the
                # class absent (shim-less session); a transient py4j/GC
                # hiccup must not silently downgrade this rollup to the
                # ~100x slower job path forever (review r10p5, ADVICE r10)
                if spark is not None and self._shim_absent(spark):
                    ops = None
                else:
                    import warnings

                    warnings.warn(
                        f"direct sketch-ask probe failed transiently "
                        f"({e!r}) — this ask takes the job path; the next "
                        "ask re-probes",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    return None  # NOT latched
            self._jvm_ops = ops
        return ops

    #: Strings the direct path resolves itself: the classic Spark
    #: timestamp-literal shapes only. The engine's parse_ts_literal
    #: (fromisoformat-based) ACCEPTS more — ISO basic '20240201', week
    #: dates '2024-W05-1', zone-suffixed forms — some of which Spark's
    #: ANSI cast REJECTS; resolving those directly would silently answer
    #: bounds the job path raises on (review r10p3, probe-confirmed).
    #: Everything outside the gate falls back: correct either way, just
    #: slower.
    _DIRECT_TS_RE = re.compile(
        r"^\s*\d{4}-\d{2}-\d{2}"
        r"([ T]\d{2}:\d{2}(:\d{2}(\.\d{1,6})?)?)?\s*$"
    )

    #: Mirror/ask size caps: above these the job path is the RIGHT plan —
    #: it keeps the sketch bytes in executor cache and moves one merged
    #: sketch, while the direct path would copy the range's bytes through
    #: the single py4j socket and hold them twice (review r10p3). 120k
    #: buckets ≈ a decade of hourly (or 3 months of minute) buckets; the
    #: BYTE cap is the real guard (review r10p4: 120k keyed theta rows at
    #: a raised lg_k could be multi-GB under a rows-only cap).
    _MIRROR_MAX_ROWS = 120_000
    _MIRROR_MAX_BYTES = 256 << 20
    _DIRECT_MAX_BYTES = 64 << 20
    #: r13: tier/rung-served SERIES asks that would still frame more than
    #: this many bytes fall back to the one-job path instead — see the
    #: escape hatch in :meth:`_grouped_cells`.
    _TIER_JOB_ESCAPE_BYTES = 32 << 20

    @staticmethod
    def _epoch_bound(v):
        """Driver-side epoch seconds for a range bound, EXACTLY as the job
        path's ``F.lit(v).cast('timestamp')`` resolves it, or None to force
        the job path: ints are epoch seconds (probe r10: CAST(100 AS
        TIMESTAMP) = epoch 100); datetimes resolve through
        ``datetime.timestamp()`` — PySpark converts a NAIVE datetime
        literal through the PYTHON PROCESS's local timezone, which
        ``.timestamp()`` mirrors exactly (tz-aware values are absolute
        instants either way, and ``unix_timestamp`` floors the fraction);
        strings resolve only inside the classic-literal gate
        (`_DIRECT_TS_RE`) and floor like the cast (probe r10); everything
        else — bools, floats, dates, exotic ISO forms — returns None so
        the job path keeps its own coercions and ANSI cast errors."""
        import datetime as _dt

        if isinstance(v, bool) or isinstance(v, float):
            return None
        if isinstance(v, int):
            return v
        if isinstance(v, _dt.datetime):
            # mirror PySpark's DatetimeConverter EXACTLY (review r10p4):
            # naive -> time.mktime(timetuple()) in the PROCESS-local tz,
            # aware -> calendar.timegm(utctimetuple()). datetime
            # .timestamp() disagrees for datetime SUBCLASSES (a naive
            # pd.Timestamp treats itself as UTC) and in DST-ambiguous
            # local hours; timetuple() is what the converter reads, so
            # subclasses cannot diverge. unix_timestamp then floors the
            # microsecond fraction on the job path — timetuple carries
            # none, matching.
            if v.tzinfo is None:
                import time as _time

                return int(_time.mktime(v.timetuple()))
            import calendar

            return calendar.timegm(v.utctimetuple())
        if isinstance(v, str) and SketchRetention._DIRECT_TS_RE.match(v):
            try:
                return SketchRetention._epoch_sec(v)
            except ValueError:
                # date-SHAPED but invalid ('2024-02-30'): the parser's
                # date branch raises where its datetime branch returns
                # None — either way the job path must own the error
                # (ANSI CAST_INVALID_INPUT), so fall back (review r10p4)
                return None
        return None

    def _lazy_lock(self, attr: str):
        """Per-instance lock, minted once: plain ``get`` on the hot path
        (review pass 3: ``setdefault`` alone constructs-and-discards a
        Lock on EVERY access), ``setdefault`` — atomic under the GIL — on
        the first, so two racing first-asks cannot mint two locks."""
        lock = self.__dict__.get(attr)
        if lock is None:
            import threading

            lock = self.__dict__.setdefault(attr, threading.Lock())
        return lock

    @property
    def _publish_lock(self):
        """Tiny leaf lock serializing the (frame, tiers) pair: held by
        :meth:`_mirror_box`'s read-check-create and by compact_before's
        publication block ONLY — attribute assignments, never Spark work,
        so contention is nanoseconds. Publication ordering alone cannot
        make a two-attribute pair coherent (r11 review pass 2: a reader
        preempted between the ``_df`` and ``tiers`` reads pairs them
        across a completed compaction no matter which order the writer
        stores them in)."""
        return self._lazy_lock("_publish_lock_obj")

    @property
    def _mutate_lock(self):
        """Writer-writer lock: held for the WHOLE of compact_before and
        of every family's merge_batch (review pass 3: an operator-thread
        compaction racing the streaming maintainer's merge_batch would
        publish a merged frame built from the PRE-merge ``_df``, silently
        dropping the batch's rows — the one wrong-answer class the
        stale-never-answers discipline exists to forbid). Mutations are
        rare and seconds-long; serializing them is the semantics, not a
        bottleneck. Lock order: _mutate_lock OUTER, _publish_lock inner;
        readers take only _publish_lock, so no deadlock is possible."""
        return self._lazy_lock("_mutate_lock_obj")

    def _mirror_box(self) -> dict:
        """The mirror's holder, keyed to the CURRENT frame by identity:
        a direct ask racing a streaming merge can finish its collect after
        the mutation swapped ``_df`` — publishing into ``self`` would pin
        pre-merge answers until the next mutation (review r10p3). Readers
        publish into THEIR box; any ask after the swap sees a different
        frame identity and opens a fresh box, so staleness is bounded by
        the racing ask itself (the memo's at-worst-recompute contract).

        The box pairs the frame with a TIERS SNAPSHOT (ADVICE r10), and
        the pairing happens under :attr:`_publish_lock` so it can never
        interleave with compact_before's publication — the only mutation
        that changes both attributes (merge_batch swaps only ``_df``, so
        its rebuilt box pairs the new frame with unchanged tiers without
        needing the lock on its own store)."""
        with self._publish_lock:
            df = self._df
            box = getattr(self, "_mirror_ref", None)
            if box is None or box["df"] is not df:
                box = self._mirror_ref = {
                    "df": df,
                    "tiers": list(self.tiers),
                    "m": None,
                }
            return box

    def _bytes_mirror(self, col: str, box: dict | None = None):
        """``(secs int64 ndarray, bufs list[bytes|None], keys list|None)``
        of the rollup, sec-sorted — collected ONCE per data version
        (mutations swap the frame, which retires the box; invalidate_asks
        does NOT drop it: the memo prices repeat asks, the mirror is
        data). ``False`` when the rollup exceeds `_MIRROR_MAX_ROWS` (the
        job path is the right plan there). Keyed rollups mirror every
        (sec, key, bytes) row; unkeyed asks union across keys exactly
        like the job path, and keyed asks answer directly ONLY under the
        same-type gate (:meth:`_key_gate`) — the cross-type coercion
        grammar stays on the job path (the frequency minefield)."""
        if box is None:
            box = self._mirror_box()
        m = box["m"]
        if m is not None:
            return m
        import numpy as np

        df = box["df"]
        # ONE combined pre-job prices the mirror before collecting it:
        # rows AND bytes (the byte cap is the real OOM guard — review
        # r10p4). Two small jobs per DATA VERSION (this + the collect),
        # never per ask.
        sized = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.length(F.col(col))), F.lit(0)).alias("b"),
        ).collect()[0]
        if sized["n"] > self._MIRROR_MAX_ROWS or sized["b"] > self._MIRROR_MAX_BYTES:
            m = box["m"] = False
            return m
        keyed = self.key_column is not None and "__key" in df.columns
        cols = ["__sec", col] + (["__key"] if keyed else [])
        rows = df.select(*cols).collect()
        rows.sort(key=lambda r: r[0])
        secs = np.array([r[0] for r in rows], dtype=np.int64)
        bufs = [None if r[1] is None else bytes(r[1]) for r in rows]
        keys = [r[2] for r in rows] if keyed else None
        m = box["m"] = (secs, bufs, keys)
        return m

    def _drop_mirror(self) -> None:
        self._mirror_ref = None
        self._jvm_ops = _MEMO_MISS  # session could differ after load

    def _warm_mirror(self, col: str) -> None:
        """Eager warm on fresh builds/loads (the r9 zero-job-from-the-
        start discipline) — but only when the session can actually serve
        direct asks; stale loads stay lazy (collects they could never
        serve)."""
        if not self.stale and self._sketch_ops() is not None:
            self._bytes_mirror(col)

    #: "no key restriction" sentinel for _direct_frame — None is a real
    #: (NULL-partition) ask value, so absence needs its own object
    _NO_ASK = object()

    #: Key-column SQL types whose SAME-TYPE Python equality IS Spark's
    #: equality — the only keyed asks the direct path serves (r11, the
    #: r10 verdict's #6). Cross-type asks (int on a string column, bool,
    #: floats, decimals, dates, structs) involve Spark's coercion grammar
    #: — the probe-pinned frequency minefield — and stay on the job path.
    _DIRECT_KEY_TYPES = {"string": str, "bigint": int, "int": int,
                         "smallint": int, "tinyint": int}

    def _key_gate(self, key) -> bool:
        """Whether a keyed ask can answer driver-side: NULL asks match the
        NULL partition identically on any key type; otherwise the ask's
        Python type must be the key column's exact counterpart (bool is
        NOT int here — ``F.lit(True)`` casts through a different grammar
        than ``F.lit(1)``)."""
        if self.key_column is None:
            return False  # the job path owns the "no key column" raise
        dtype = dict(self._df.dtypes).get("__key")
        if dtype is None:
            # key_column set but no __key column (hand-built handle): the
            # job path owns the missing-column raise — NULL asks included
            # (r11 review: the None early-return sat before this check)
            return False
        if key is None:
            return True  # eqNullSafe NULL-partition match, type-independent
        want = self._DIRECT_KEY_TYPES.get(dtype)
        if want is None or type(key) is not want:
            return False
        if want is int and not -(2**63) <= key < 2**63:
            return False  # job path owns the out-of-long-range error
        return True

    def _direct_frame(self, col: str, start, end, key=_NO_ASK):
        """ONE gate for every family's direct branch (review r10p3 —
        the guard was drifting across four call sites): ``(framed, n)``
        when the direct path applies — shim present on a UTC session,
        job-equivalent bounds, a same-type (or NULL, or absent) key
        restriction, mirror and blob inside the size caps — else None
        (job path)."""
        if self._sketch_ops() is None:
            return None
        if key is not SketchRetention._NO_ASK and not self._key_gate(key):
            return None
        a = self._epoch_bound(start)
        b = self._epoch_bound(end)
        if a is None or b is None:
            return None
        return self._framed_range(col, a, b, key)

    def _selected_indices(self, box: dict, secs, a: int, b: int):
        """Mirror-row indices intersecting ``[a, b)`` — the ONE driver-side
        copy of ``_range_filter``'s selection (``sec > a - width AND
        sec < b``, per-row tier-aware width; reversed tiers so the FIRST
        matching tier wins, like ``_width_expr``'s CASE chain). Tiers come
        from the MIRROR BOX, not ``self`` — the box is the one consistent
        (frame, tiers) snapshot under a racing compact_before (ADVICE
        r10). Shared by the scalar and grouped framers so the superset
        semantics cannot drift between them (the r10p3 guard-drift
        lesson)."""
        import numpy as np

        if not len(secs):
            return np.empty(0, dtype=np.int64)
        w = np.full(len(secs), self.bucket_seconds, dtype=np.int64)
        for end, tw in reversed(box["tiers"]):
            w[secs < end] = tw
        return np.nonzero((secs > a - w) & (secs < b))[0]

    def _framed_range(self, col: str, a: int, b: int, key=_NO_ASK):
        """``(framed_blob, n_selected)`` for the sketches intersecting
        ``[a, b)`` (selection via :meth:`_selected_indices`), optionally
        restricted to one key partition (same-type equality only — the
        caller's :meth:`_key_gate` vouched; ``key=None`` is the NULL
        partition, matching ``eqNullSafe``) — or None when the
        mirror/blob exceeds the size caps."""
        import struct

        box = self._mirror_box()
        m = self._bytes_mirror(col, box)
        # r12: day-aligned SCALAR ranges frame the tier's day merges too —
        # the same whole-day-slicing proof as the series forms, and on an
        # over-cap mirror the job-built tier is the only direct path. The
        # returned n is the RAW non-NULL frame count in range, so the
        # callers' empty-range semantics (0 / NULL-per-rank) are decided
        # on the same numbers as the raw framing.
        if self._tier_serves_range(box, a, b):
            sel = None
            if key is SketchRetention._NO_ASK and self.key_column is None:
                tier = self._day_tier(col, box)
                if tier is not None:
                    dsecs, dbufs, dcounts = tier
                    sel, n = [], 0
                    for d, buf, c in zip(dsecs.tolist(), dbufs, dcounts):
                        if a <= d < b:
                            n += c
                            if buf is not None:
                                sel.append(buf)
            elif key is not SketchRetention._NO_ASK and self.key_column is not None:
                ktier = self._keyed_day_tier(col, box)
                if ktier is not None:
                    # slice ONLY the asked key (r12 review: building the
                    # full per-key dict per ask is O(keys × days) driver
                    # CPU on a sub-ms path)
                    slot = ktier.get(key)
                    sel, n = [], 0
                    if slot is not None:
                        for d, buf, c in zip(*slot):
                            if a is not None and not (a <= d < b):
                                continue
                            n += c
                            if buf is not None:
                                sel.append(buf)
            if sel is not None:
                total = sum(len(x) for x in sel)
                if total > self._DIRECT_MAX_BYTES:
                    return None
                if total > self._TIER_JOB_ESCAPE_BYTES:
                    # r13 escape hatch (see _grouped_cells): tier-served
                    # scalars past this much framing take the one job too
                    return None
                parts = [struct.pack(">i", len(sel))]
                for bb in sel:
                    parts.append(struct.pack(">i", len(bb)))
                    parts.append(bb)
                return b"".join(parts), n
        if m is False:
            return None
        secs, bufs, keys = m

        def keep(i) -> bool:
            if bufs[i] is None:
                return False
            if key is SketchRetention._NO_ASK:
                return True
            k = keys[i] if keys is not None else None
            return k is None if key is None else k == key

        sel = [bufs[i] for i in self._selected_indices(box, secs, a, b) if keep(i)]
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            return None
        parts = [struct.pack(">i", len(sel))]
        for bb in sel:
            parts.append(struct.pack(">i", len(bb)))
            parts.append(bb)
        return b"".join(parts), len(sel)

    #: Job-path default bounds for one-sided grouped restrictions — the
    #: exact literals the families' *_by forms substitute ('1970-01-01' /
    #: '9999-01-01'), resolved once so the driver math cannot drift.
    _OPEN_START_SEC = 0
    _OPEN_END_SEC = 253_370_764_800  # epoch of '9999-01-01'

    def _resolve_open_bounds(self, start, end):
        """``(a, b)`` epoch bounds for an optionally-one-sided grouped
        restriction — ``(None, None)`` when no filter applies at all
        (matching the job path), ``False`` when a given bound cannot
        resolve job-equivalently (the caller falls back). ONE copy for
        the time-grouped and key-grouped gates (r11 review pass 8)."""
        if start is None and end is None:
            return None, None
        a = self._OPEN_START_SEC if start is None else self._epoch_bound(start)
        b = self._OPEN_END_SEC if end is None else self._epoch_bound(end)
        if a is None or b is None:
            return False
        return a, b

    @staticmethod
    def _pack_grouped(counts, sel):
        """The grouped blob: ``[n_cells][count_i]*n [len bytes]*`` —
        ONE copy of the wire format's write side (three call sites were
        drifting candidates, the r10p3 lesson)."""
        import struct

        parts = [struct.pack(f">i{len(counts)}i", len(counts), *counts)]
        for bb in sel:
            parts.append(struct.pack(">i", len(bb)))
            parts.append(bb)
        return b"".join(parts)

    @staticmethod
    def _unframe(blob: bytes) -> list:
        """Read side of the plain frame layout ``[n][len bytes]*`` (the
        ``*MergeGrouped`` return shape); zero-length frames — empty cells —
        come back as None."""
        import struct

        (n,) = struct.unpack_from(">i", blob, 0)
        off = 4
        out = []
        for _ in range(n):
            (ln,) = struct.unpack_from(">i", blob, off)
            off += 4
            out.append(bytes(blob[off : off + ln]) if ln else None)
            off += ln
        return out

    #: Coarse pre-merge tier (r12 — the r11 verdict's grouped-at-scale
    #: finding): a FULL-SPAN series ask at day-or-coarser granularity over
    #: a mirror at least this many rows deep answers from per-UTC-day
    #: PRE-MERGED sketches instead of framing every raw bucket's bytes —
    #: the measured sf1 week series shipped 7.1 MB (7200 hourly sketches)
    #: through the py4j socket per fresh ask; the day tier ships ~350
    #: merged sketches. Below the threshold the raw framing is already
    #: cheap and the one-time pre-merge would not amortize.
    _TIER_MIN_ROWS = 2048
    _TIER_SECONDS = 86400

    def _jvm_merge_grouped(self, ops):
        """The family's ``*MergeGrouped`` JVM op (bound method) or None
        when the family has no pre-merge (tier disabled). Overridden by
        each rollup class; merge semantics per family: theta unions are
        exact set algebra, HLL register unions are associative (identical
        final state), KLL merges are rank-bounded — each exactly the
        direct-vs-job contract that family already documents."""
        return None

    def _tier_serves_range(self, box: dict, a: int, b: int) -> bool:
        """Whether a RESTRICTED ask may slice the day tier instead of the
        width-aware raw selection (r12): requires day-aligned bounds AND
        every bucket width in play (base + compaction tiers) dividing a
        day. Then bucket starts are day-interior (no bucket crosses a day
        boundary), no bucket start can fall strictly inside ``(a - w,
        a)``, and ``_selected_indices``' superset rule ``sec > a - w AND
        sec < b`` reduces EXACTLY to ``sec ∈ [a, b)`` — which whole-day
        slicing reproduces. Any non-dividing width (a 7h grid, a weekly
        compaction tier) or unaligned bound keeps the raw framing."""
        d = self._TIER_SECONDS
        if a % d or b % d:
            return False
        widths = [self.bucket_seconds] + [w for _end, w in box["tiers"]]
        return all(w > 0 and d % w == 0 for w in widths)

    def _tier_granularity_ok(self, granularity) -> bool:
        """Day-composable ask granularities: the named calendar levels day
        and coarser, or int widths that are multiples of 86400 — cell
        assignment by bucket START provably composes through the day
        truncation (``trunc_g(trunc_day(s)) == trunc_g(s)``)."""
        if isinstance(granularity, int):
            return granularity % self._TIER_SECONDS == 0
        return granularity in ("day", "week", "month", "quarter", "year")

    def _day_tier(self, col: str, box: dict):
        """``(day_secs int64 ndarray, merged_bufs, raw_counts)`` — the
        per-UTC-day pre-merged tier — or None when the mirror is
        ineligible (callers gate ask eligibility with
        :meth:`_tier_granularity_ok` / :meth:`_tier_serves_range`), so
        tier-served cells/counts/unions are EXACTLY the raw framing's.
        Keyed rollups keep the raw path (their mirror rows carry per-key
        frames). Built at most once per mirror box (one framing + one
        ``*MergeGrouped`` py4j call, or ONE Spark job past the caps),
        cached as data next to the mirror — mutations retire the box,
        invalidate_asks does not. ``False`` in the cache marks an
        over-cap build attempt."""
        import numpy as np

        ops = self._sketch_ops()
        if ops is None:
            return None
        merge = self._jvm_merge_grouped(ops)
        if merge is None:
            return None
        cache = box.setdefault("day_tier", {})
        t = cache.get(col)
        if t is not None:
            return None if t is False else t
        m = box["m"]
        if m is False:
            # no raw mirror to pre-merge driver-side (over-cap rollup) —
            # the tier exists ONLY via the job build, size-guarded there
            if self.key_column is not None:
                return None
            t = self._day_tier_via_job(col, box)
            cache[col] = False if t is None else t
            return t
        secs, bufs, keys = m
        if keys is not None or len(secs) < self._TIER_MIN_ROWS:
            return None
        from ..functions.timestamps import bucket_starts

        kb = bucket_starts(secs, "day")
        dsecs: list = []
        counts: list = []
        frame_counts: list = []
        sel: list = []
        for bk, buf in zip(kb.tolist(), bufs):
            if not dsecs or bk != dsecs[-1]:
                dsecs.append(bk)
                counts.append(0)
                frame_counts.append(0)
            if buf is not None:
                sel.append(buf)
                counts[-1] += 1
                frame_counts[-1] += 1
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            # too many raw bytes for ONE socket copy, even once — build
            # the tier with ONE tiny Spark job instead (day-grouped union
            # agg over the cached rollup; output is days × sketch, well
            # under every cap). The job path is the right plan for moving
            # this much sketch state ANYWAY (bytes stay executor-side);
            # paying it once per data version buys every later full-span
            # series ask the O(days) framing. Covers the 64-256 MB band
            # between _DIRECT_MAX_BYTES and the mirror cap where every
            # fresh series ask used to fall back to a per-ask job.
            t = self._day_tier_via_job(col, box)
            cache[col] = False if t is None else t
            return t
        merged = self._unframe(bytes(merge(self._pack_grouped(frame_counts, sel))))
        t = (np.asarray(dsecs, dtype=np.int64), merged, counts)
        cache[col] = t
        return t

    def _tier_job_rows(self, col: str, box: dict, keyed: bool):
        """ONE shared job-build core for BOTH tiers (r12 review: the
        caps/fallback guards must not live in two drifting copies):
        pre-SIZED before collecting (the ``_bytes_mirror`` discipline —
        a post-collect guard would materialize an unbounded keys × days
        result on the driver before it could refuse) — rows first via a
        cheap countDistinct fast-refuse, then, over the PERSISTED
        day-grouped ``_union_agg_exprs`` + non-NULL frame count, BOTH
        caps from one tiny size aggregate BEFORE the row collect (r12
        ADVICE: day-merged theta/KLL sketches can be orders of magnitude
        larger than their count — up to 120k of them must never land on
        the driver before the byte cap can speak; the persist makes the
        union agg run once, exactly like caching the grouped frame).
        Returns sorted collected rows (``[key,] day_sec, sketch, n``) or
        None. All-NULL cells surface as empty sketches + count 0 (the
        probed union-over-NULLs semantics), which the ask-time counts
        map to the job path's NULL arms identically."""
        # floor division, not %: Spark's % follows the dividend's sign,
        # which would mis-bucket pre-epoch seconds vs bucket_starts'
        # floored arithmetic
        day = (
            F.floor(F.col("__sec") / self._TIER_SECONDS) * self._TIER_SECONDS
        ).cast("long")
        # struct-wrapped when keyed so NULL-key rows still count (bare
        # multi-arg countDistinct drops any row with a NULL argument)
        sized_expr = (
            F.countDistinct(F.struct(F.col("__key"), day))
            if keyed
            else F.countDistinct(day)
        )
        sized = box["df"].agg(sized_expr.alias("n")).collect()[0]
        if sized["n"] > self._MIRROR_MAX_ROWS:
            return None
        gcols = ([F.col("__key")] if keyed else []) + [day.alias("__sec")]
        g = (
            box["df"]
            .groupBy(*gcols)
            .agg(*self._union_agg_exprs(), F.count(F.col(col)).alias("__n"))
            .persist()
        )
        try:
            scol = g.columns[2 if keyed else 1]
            gsized = g.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.length(F.col(scol))), F.lit(0)).alias("b"),
            ).collect()[0]
            if (
                gsized["n"] == 0
                or gsized["n"] > self._MIRROR_MAX_ROWS
                or gsized["b"] > self._MIRROR_MAX_BYTES
            ):
                return None
            return g.collect()
        finally:
            g.unpersist()

    #: Coarse-rung ladder floor (r13 — the r12 verdict's full-span
    #: finding): a day tier at least this many days deep gets a second
    #: pre-merged rung AT THE ASK GRANULARITY for coarser-than-day series
    #: (week/month/quarter/year, or int multiples of a day), so a
    #: full-span week ask frames O(weeks) merged sketches instead of
    #: O(days) — the sf10 full-span series framed ~3,500 day sketches at
    #: 670 ms, past its own ~300 ms one-job floor; the week rung frames
    #: ~500. Below the floor the day framing is already cheap and the
    #: extra merge call would not amortize.
    _RUNG_MIN_DAYS = 180

    def _rung_serves_bounds(self, granularity, a: int, b: int) -> bool:
        """Whether ``[a, b)`` lands exactly on rung-cell boundaries —
        both bounds are fixed points of the granularity's truncation, so
        every rung cell is wholly inside or wholly outside the range and
        rung slicing reproduces the day tier's whole-day slicing (which
        :meth:`_tier_serves_range` already proved equals the raw
        selection). Unaligned bounds keep the day tier: its edge cells
        group partially into the ask's first/last bucket, which a
        pre-merged rung cell could not represent."""
        import numpy as np

        from ..functions.timestamps import bucket_starts

        kb = bucket_starts(np.asarray([a, b], dtype=np.int64), granularity)
        return int(kb[0]) == a and int(kb[1]) == b

    def _coarse_rung(self, col: str, box: dict, granularity):
        """``(rung_secs int64 ndarray, merged_bufs, raw_counts)`` — the
        per-(col, granularity) pre-merged rung ABOVE the day tier — or
        None when ineligible (day-or-finer ask, shallow tier, no merge
        op, over-cap bytes). Built from the day tier's driver-resident
        bytes with ONE ``*MergeGrouped`` py4j call per (col, granularity)
        per box (mutations retire the box with the tier), so the ladder
        is day → ask-granularity with no extra Spark jobs. Exactness
        inherits each family's tier contract verbatim — the rung is one
        more level of the same union monoid (theta set algebra and HLL
        register unions are associative, so rung == day tier == raw
        framing bit-for-bit; KLL stays rank-bounded, merge-tree depth
        does not change its worst-case bound). Counts are the summed raw
        non-NULL frame counts of the member days, so count-0 cells keep
        the job path's NULL arms on the same numbers as the day tier."""
        import numpy as np

        if isinstance(granularity, int):
            if granularity <= self._TIER_SECONDS:
                return None
        elif granularity == "day":
            return None
        ops = self._sketch_ops()
        if ops is None:
            return None
        merge = self._jvm_merge_grouped(ops)
        if merge is None:
            return None
        cache = box.setdefault("rung", {})
        ckey = (col, granularity)
        t = cache.get(ckey)
        if t is not None:
            return None if t is False else t
        day = self._day_tier(col, box)
        if day is None:
            # no False cache: the day tier own-caches, and its refusal
            # may be knob-dependent (tests flip _TIER_MIN_ROWS) — only
            # intrinsic conditions below pin False
            return None
        if len(day[0]) < self._RUNG_MIN_DAYS:
            cache[ckey] = False
            return None
        from ..functions.timestamps import bucket_starts

        dsecs, dbufs, dcounts = day
        kb = bucket_starts(dsecs, granularity)
        rsecs: list = []
        fcounts: list = []
        rcounts: list = []
        sel: list = []
        for bk, buf, c in zip(kb.tolist(), dbufs, dcounts):
            if not rsecs or bk != rsecs[-1]:
                rsecs.append(bk)
                fcounts.append(0)
                rcounts.append(0)
            rcounts[-1] += c
            if buf is not None:
                sel.append(buf)
                fcounts[-1] += 1
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            cache[ckey] = False
            return None
        merged = self._unframe(bytes(merge(self._pack_grouped(fcounts, sel))))
        t = (np.asarray(rsecs, dtype=np.int64), merged, rcounts)
        cache[ckey] = t
        return t

    def _day_tier_via_job(self, col: str, box: dict):
        """The day tier by ONE Spark job — see :meth:`_tier_job_rows`."""
        import numpy as np

        rows = self._tier_job_rows(col, box, keyed=False)
        if rows is None:
            return None
        rows.sort(key=lambda r: r[0])
        dsecs = np.asarray([r[0] for r in rows], dtype=np.int64)
        bufs = [None if r[1] is None else bytes(r[1]) for r in rows]
        counts = [int(r[2]) for r in rows]
        return dsecs, bufs, counts

    def _grouped_cells(self, col, granularity, start, end, keyed_ask=False):
        """The grouped direct-ask gate (r11 — approx_*_by's economics):
        ``(bucket_secs, framed_blob, counts)`` when the series can answer
        from the driver mirror, else None (job path). ``bucket_secs`` are
        the ascending occupied cells over the (optionally restricted)
        mirror, bucketed with the SAME driver-side truncation the
        frequency family pinned (``functions.timestamps.bucket_starts`` —
        named date_trunc levels + epoch-aligned int widths); ``counts[i]``
        is cell i's number of non-NULL sketch frames inside
        ``framed_blob`` — whose layout embeds them:
        ``[n_cells:int32][count_i:int32]*n [len:int32 bytes]*`` big-endian,
        and the ``*Grouped`` results come back as packed byte blobs too,
        because py4j moves byte[] in one bulk transfer while int[]/long[]
        arguments and returns pay one gateway round trip PER ELEMENT
        (~0.3 ms each — measured ~9 ms of pure counts shipping on a
        29-cell series before this layout). So the JVM merges a whole
        dashboard series in ONE py4j round trip with two bulk transfers.
        Exotic date_trunc levels, unresolvable bounds, keyed asks,
        shim-less/non-UTC sessions, and over-cap mirrors/blobs all fall
        back — correct either way, just the ~200 ms job floor.
        Granularity VALIDATION (`_check_granularity`) is the caller's job:
        it must raise on both paths, never route-dependently."""
        import struct

        import numpy as np

        if keyed_ask or self._sketch_ops() is None:
            return None
        if not isinstance(granularity, int):
            from ..functions.timestamps import (
                CALENDAR_GRANULARITIES,
                GRANULARITIES,
            )

            g = str(granularity).lower()
            if g not in GRANULARITIES and g not in CALENDAR_GRANULARITIES:
                return None  # exotic date_trunc level: job path owns it
            granularity = g
        bounds = self._resolve_open_bounds(start, end)
        if bounds is False:
            return None
        a, b = bounds
        from ..functions.timestamps import bucket_starts

        box = self._mirror_box()
        # re-validate tiling against THE BOX's tiers (r11 review pass 3):
        # the caller's up-front _check_granularity read live self.tiers,
        # and a compaction completing in between would otherwise hand a
        # fine granularity a coarse mirror — truncating 6h buckets into
        # hourly cells is a silently wrong distribution, the exact leak
        # the tiling gate forbids. Raises like the job path would under
        # the box's state.
        self._check_granularity(granularity, start, tiers=box["tiers"])
        m = self._bytes_mirror(col, box)
        tier_counts = None
        tier_eligible = self._tier_granularity_ok(granularity) and (
            a is None or self._tier_serves_range(box, a, b)
        )
        if m is False:
            # over-cap mirror (the 100 TB shape: too many raw buckets to
            # hold driver-side at all) — a tier-eligible series can STILL
            # answer direct from the job-built day tier (r12): days are
            # 24-3600x fewer than raw buckets, so the tier fits where the
            # mirror cannot. Anything the tier can't prove stays on the
            # job path.
            tier = (
                self._day_tier(col, box)
                if tier_eligible
                else None
            )
            if tier is None:
                return None
            secs, bufs, tier_counts = tier
        else:
            secs, bufs, _keys = m
            if tier_eligible:
                # r12: day-or-coarser series answer from the pre-merged
                # day tier — O(days) merged sketches through the socket
                # instead of the span's raw bucket bytes (the sf1 week
                # series measured 7.1 MB/ask raw; see _day_tier). Serves
                # the FULL span always, and RESTRICTED ranges exactly
                # when _tier_serves_range proves the width-aware
                # edge-sliver selection degenerates to whole-day slicing;
                # anything else keeps the raw framing.
                tier = self._day_tier(col, box)
                if tier is not None:
                    secs, bufs, tier_counts = tier
        if tier_counts is not None and (
            a is None or self._rung_serves_bounds(granularity, a, b)
        ):
            # r13: coarser-than-day series climb one more rung — sketches
            # pre-merged AT the ask granularity — when the day tier is
            # deep enough that O(days) framing stops being cheap (the
            # full-span sf10 week series: ~3,500 day frames, 670 ms,
            # past its own ~300 ms one-job floor; the rung frames ~500)
            rung = self._coarse_rung(col, box, granularity)
            if rung is not None:
                secs, bufs, tier_counts = rung
        if tier_counts is not None and a is not None:
            idx = np.nonzero((secs >= a) & (secs < b))[0]
        elif a is not None:
            idx = self._selected_indices(box, secs, a, b)
        else:
            idx = np.arange(len(secs))
        if not len(idx):
            return [], struct.pack(">i", 0), []
        kb = bucket_starts(secs[idx], granularity)
        # secs ascend and every truncation is monotone, so cells arrive as
        # contiguous runs — one pass, no dict. The BLOB's per-cell counts
        # are FRAME counts (the wire format's frame walker); the RETURNED
        # counts carry the NULL/coalesce algebra — identical on the raw
        # path, but a tier cell frames ONE merged sketch while reporting
        # its RAW non-NULL frame count, so count-0 cells keep the job
        # path's NULL arms on the same numbers as the raw framing.
        cells: list = []
        counts: list = []
        frame_counts: list = []
        sel: list = []
        for bk, i in zip(kb.tolist(), idx.tolist()):
            if not cells or bk != cells[-1]:
                cells.append(bk)
                counts.append(0)
                frame_counts.append(0)
            if bufs[i] is not None:
                sel.append(bufs[i])
                frame_counts[-1] += 1
                if tier_counts is None:
                    counts[-1] += 1
            if tier_counts is not None:
                counts[-1] += tier_counts[i]
        total = sum(len(x) for x in sel)
        if total > self._DIRECT_MAX_BYTES:
            return None
        if tier_counts is not None and total > self._TIER_JOB_ESCAPE_BYTES:
            # r13 jobpath escape hatch (the r12 verdict's "direct must not
            # cost more than its own job floor"): past this many framed
            # bytes the driver packing + socket copy + JVM merge loses to
            # the ONE-job executor-side merge (measured at sf10: the
            # ~64 MB full-span day framing took 670 ms vs the ~300 ms job
            # floor — ~10 ms/MB framing slope). Tier answers equal the job
            # path by each family's documented contract, so this is a
            # physical routing choice, not a semantics change. Applies
            # only to tier/rung-served asks: raw framings keep the
            # existing _DIRECT_MAX_BYTES-only rule (their job alternative
            # re-aggregates the raw rollup, a different trade).
            return None
        return cells, self._pack_grouped(frame_counts, sel), counts

    def _keyed_day_tier(self, col: str, box: dict):
        """The (key, UTC-day) pre-merged tier for the KEYED grouped gates
        (r12): ``{key: (day_secs, merged_bufs, raw_counts)}`` — the day
        tier's economics applied to the ``*_by_key`` forms, whose mirrors
        are keys × buckets deep (the heaviest framing surface). Same
        build-once-per-box, same socket-cap one-job fallback, same
        eligibility proof as :meth:`_day_tier` (callers gate ranges with
        :meth:`_tier_serves_range`; key grouping is orthogonal to the
        day slicing). ``None`` when ineligible."""
        ops = self._sketch_ops()
        if ops is None:
            return None
        merge = self._jvm_merge_grouped(ops)
        if merge is None:
            return None
        cache = box.setdefault("day_key_tier", {})
        t = cache.get(col)
        if t is not None:
            return None if t is False else t
        m = box["m"]
        if m is False:
            # over-cap keyed mirror: the (key, day) tier may still fit —
            # job build only, size-guarded there (r12)
            t = self._keyed_day_tier_via_job(col, box)
            cache[col] = False if t is None else t
            return t
        secs, bufs, keys = m
        if keys is None or len(secs) < self._TIER_MIN_ROWS:
            return None
        from ..functions.timestamps import bucket_starts

        kb = bucket_starts(secs, "day")
        idxs = sorted(
            range(len(secs)),
            key=lambda i: ((keys[i] is not None, keys[i]), kb[i]),
        )
        cells: list = []
        fcounts: list = []
        rcounts: list = []
        sel: list = []
        for i in idxs:
            kk = (keys[i], int(kb[i]))
            if not cells or cells[-1] != kk:
                cells.append(kk)
                fcounts.append(0)
                rcounts.append(0)
            if bufs[i] is not None:
                sel.append(bufs[i])
                fcounts[-1] += 1
                rcounts[-1] += 1
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            t = self._keyed_day_tier_via_job(col, box)
            cache[col] = False if t is None else t
            return t
        merged = self._unframe(
            bytes(merge(self._pack_grouped(fcounts, sel)))
        )
        out: dict = {}
        for (k, d), buf, c in zip(cells, merged, rcounts):
            slot = out.setdefault(k, ([], [], []))
            slot[0].append(d)
            slot[1].append(buf)
            slot[2].append(c)
        cache[col] = out
        return out

    def _keyed_total_rung(self, col: str, box: dict):
        """``{key: (merged_buf | None, raw_count)}`` — each key's
        FULL-SPAN pre-merge above the (key, day) tier (r13, the keyed
        sibling of :meth:`_coarse_rung`): a full-span ``*_by_key`` ask
        frames O(keys) merged sketches instead of O(keys × days), the
        heaviest remaining framing surface (keys × days can reach the
        caps long before keys alone do). Built from the keyed tier's
        driver-resident bytes with ONE ``*MergeGrouped`` call per col
        per box; exactness inherits the keyed tier contract (one more
        union-monoid level). Keys whose frames are all NULL keep an
        empty merge (None buf) + count 0 — the job path's NULL algebra.
        Range-restricted asks never use it (a total can't be sliced);
        they keep the (key, day) tier."""
        ops = self._sketch_ops()
        if ops is None:
            return None
        merge = self._jvm_merge_grouped(ops)
        if merge is None:
            return None
        cache = box.setdefault("key_total_rung", {})
        t = cache.get(col)
        if t is not None:
            return None if t is False else t
        tier = self._keyed_day_tier(col, box)
        if tier is None:
            # no False cache — see _coarse_rung: the keyed tier
            # own-caches and its refusal may be knob-dependent
            return None
        # floor on per-key day DEPTH (r14; r13 summed (key, day) cells,
        # so 200 keys × 1 day crossed a "180-day" floor though the merge
        # gains nothing over the tier framing): the rung's win is the
        # days-1 unions it pre-pays per key, so gate on the deepest key
        if (
            not tier
            or max(len(v[0]) for v in tier.values()) < self._RUNG_MIN_DAYS
        ):
            cache[col] = False
            return None
        ordered = sorted(tier, key=lambda k: (k is not None, k))
        fcounts: list = []
        counts: list = []
        sel: list = []
        for k in ordered:
            _dsecs, bufs, cts = tier[k]
            fr = [b for b in bufs if b is not None]
            sel.extend(fr)
            fcounts.append(len(fr))
            counts.append(sum(cts))
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            cache[col] = False
            return None
        merged = self._unframe(bytes(merge(self._pack_grouped(fcounts, sel))))
        t = {k: (buf, c) for k, buf, c in zip(ordered, merged, counts)}
        cache[col] = t
        return t

    def _keyed_day_tier_via_job(self, col: str, box: dict):
        """(key, day) tier by ONE Spark job — the shared
        :meth:`_tier_job_rows` core (keys × days can be unbounded under a
        high-cardinality ``partition_by``, hence the pre-collect sizing
        there), regrouped per key."""
        rows = self._tier_job_rows(col, box, keyed=True)
        if rows is None:
            return None
        rows.sort(key=lambda r: ((r[0] is not None, r[0]), r[1]))
        out: dict = {}
        for r in rows:
            slot = out.setdefault(r[0], ([], [], []))
            slot[0].append(int(r[1]))
            slot[1].append(None if r[2] is None else bytes(r[2]))
            slot[2].append(int(r[3]))
        return out

    @staticmethod
    def _tier_key_frames(tier: dict, a, b):
        """Slice a keyed day tier to ``[a, b)`` (``a=None`` = full span):
        ``{key: (bufs_in_range, raw_count_in_range)}`` with keys that
        have NO days in range omitted — exactly the raw selection's
        key-presence rule."""
        out: dict = {}
        for k, (dsecs, bufs, counts) in tier.items():
            fr: list = []
            n = 0
            present = False
            for d, buf, c in zip(dsecs, bufs, counts):
                if a is not None and not (a <= d < b):
                    continue
                present = True
                n += c
                if buf is not None:
                    fr.append(buf)
            if present:
                out[k] = (fr, n)
        return out

    def _keyed_cells(self, col, start, end):
        """The PER-KEY grouped gate (the ``*_by_key`` dimensional forms):
        ``(key_values, framed_blob, counts)`` with keys in the job path's
        ``ORDER BY key`` order (ascending, NULL FIRST — Spark's ASC
        default), else None. Only key-column types whose collected Python
        values sort the way Spark sorts them ride (the same
        `_DIRECT_KEY_TYPES` set the keyed scalar gate uses: one type per
        column, no cross-type comparator subtleties); everything else —
        plus shim-less sessions, unresolvable bounds, over-cap mirrors —
        falls back to the job path. Blob layout and the batched ``*Grouped``
        JVM ops are exactly :meth:`_grouped_cells`'s."""
        import struct

        import numpy as np

        if self.key_column is None or self._sketch_ops() is None:
            return None
        if self._DIRECT_KEY_TYPES.get(dict(self._df.dtypes).get("__key", "")) is None:
            return None  # also refuses a hand-built handle without __key
        bounds = self._resolve_open_bounds(start, end)
        if bounds is False:
            return None
        a, b = bounds
        box = self._mirror_box()
        m = self._bytes_mirror(col, box)
        # r12: the (key, day) tier serves full spans and provably-safe
        # day-aligned ranges (see _tier_serves_range) — O(keys × days)
        # merged frames instead of keys × raw buckets; for an OVER-CAP
        # mirror (m is False) the job-built tier is the only direct path
        if a is None or self._tier_serves_range(box, a, b):
            if a is None:
                # r13: full-span asks climb to the key-total rung —
                # O(keys) frames instead of O(keys × days)
                rung = self._keyed_total_rung(col, box)
                if rung is not None:
                    ordered = sorted(rung, key=lambda k: (k is not None, k))
                    counts = [rung[k][1] for k in ordered]
                    fcounts = [
                        0 if rung[k][0] is None else 1 for k in ordered
                    ]
                    sel = [
                        rung[k][0] for k in ordered if rung[k][0] is not None
                    ]
                    # r14: the escape hatch applies here like every other
                    # tier/rung surface (r13 gated only on
                    # _DIRECT_MAX_BYTES, leaving a 32-64 MB band — large-k
                    # sketches × thousands of keys — where O(keys) framing
                    # still loses to the ~300 ms one-job floor at the
                    # measured ~10 ms/MB framing slope)
                    if (
                        sum(len(x) for x in sel)
                        <= self._TIER_JOB_ESCAPE_BYTES
                    ):
                        return ordered, self._pack_grouped(fcounts, sel), counts
                    return None
            tier = self._keyed_day_tier(col, box)
            if tier is not None:
                per_key = self._tier_key_frames(tier, a, b)
                if not per_key:
                    return [], struct.pack(">i", 0), []
                ordered = sorted(per_key, key=lambda k: (k is not None, k))
                counts = [per_key[k][1] for k in ordered]
                fcounts = [len(per_key[k][0]) for k in ordered]
                sel = [bb for k in ordered for bb in per_key[k][0]]
                total = sum(len(x) for x in sel)
                if total > self._DIRECT_MAX_BYTES:
                    return None
                if total > self._TIER_JOB_ESCAPE_BYTES:
                    # r13 escape hatch (see _grouped_cells): past this
                    # much framing the one-job merge is cheaper
                    return None
                return ordered, self._pack_grouped(fcounts, sel), counts
        if m is False:
            return None
        # keys cannot be None here: the dtype gate above proved __key is
        # a column of the same df the mirror box is identity-keyed to
        secs, bufs, keys = m
        if a is not None:
            idx = self._selected_indices(box, secs, a, b)
        else:
            idx = np.arange(len(secs))
        if not len(idx):
            return [], struct.pack(">i", 0), []
        # keys are NOT contiguous in the sec-sorted mirror — one dict pass,
        # then the job path's ordering: ascending with NULL first
        frames: dict = {}
        for i in idx.tolist():
            frames.setdefault(keys[i], []).append(bufs[i])
        ordered = sorted(frames, key=lambda k: (k is not None, k))
        cells: list = []
        counts: list = []
        sel: list = []
        for k in ordered:
            cells.append(k)
            n = 0
            for bb in frames[k]:
                if bb is not None:
                    sel.append(bb)
                    n += 1
            counts.append(n)
        if sum(len(x) for x in sel) > self._DIRECT_MAX_BYTES:
            return None
        return cells, self._pack_grouped(counts, sel), counts

    def _keyed_pair_cells(self, col, r1, r2):
        """Per-key TWO-range framing (theta's ``retained_by_key`` shape):
        ``(key_values, framed_r1, framed_r2)`` with keys that have mirror
        rows in EITHER range — the job path's ``f1|f2`` groupBy — in its
        ``ORDER BY key`` order (ascending, NULL first), each key's frames
        split per range against ONE mirror snapshot (a row inside both
        ranges contributes to both, exactly like the ``WHEN(f1/f2)``
        projections). Bounds are REQUIRED ``(start, end)`` pairs (the
        cohort ask has no open form). Gates as :meth:`_keyed_cells`; blob
        layout as :meth:`_pack_grouped` — a key with only NULL frames on
        one side frames an empty cell there, which unions to the empty
        sketch (estimate 0) like the job path's all-NULL union."""
        if self.key_column is None or self._sketch_ops() is None:
            return None
        if self._DIRECT_KEY_TYPES.get(dict(self._df.dtypes).get("__key", "")) is None:
            return None
        spans = []
        for s, e in (r1, r2):
            a = self._epoch_bound(s)
            b = self._epoch_bound(e)
            if a is None or b is None:
                return None
            spans.append((a, b))
        box = self._mirror_box()
        m = self._bytes_mirror(col, box)
        # r12: both ranges provably day-sliceable -> the (key, day) tier
        # frames O(keys × days-in-range) merged sketches per side; for an
        # over-cap mirror (m is False) the job-built tier is the only
        # direct path
        if all(self._tier_serves_range(box, a, b) for a, b in spans):
            tier = self._keyed_day_tier(col, box)
            if tier is not None:
                sides = [
                    self._tier_key_frames(tier, a, b) for a, b in spans
                ]
                merged_keys = set(sides[0]) | set(sides[1])
                ordered = sorted(
                    merged_keys, key=lambda k: (k is not None, k)
                )
                blobs = []
                total = 0
                for side in sides:
                    fcounts: list = []
                    sel: list = []
                    for k in ordered:
                        fr = side.get(k, ([], 0))[0]
                        sel.extend(fr)
                        fcounts.append(len(fr))
                    total += sum(len(x) for x in sel)
                    blobs.append(self._pack_grouped(fcounts, sel))
                if total > self._DIRECT_MAX_BYTES:
                    return None
                if total > self._TIER_JOB_ESCAPE_BYTES:
                    # r13 escape hatch (see _grouped_cells)
                    return None
                return ordered, blobs[0], blobs[1]
        if m is False:
            return None
        secs, bufs, keys = m  # dtype gate above proved __key exists
        frames: dict = {}
        for j, (a, b) in enumerate(spans):
            for i in self._selected_indices(box, secs, a, b).tolist():
                frames.setdefault(keys[i], ([], []))[j].append(bufs[i])
        ordered = sorted(frames, key=lambda k: (k is not None, k))
        blobs = []
        total = 0
        for j in (0, 1):
            counts: list = []
            sel: list = []
            for k in ordered:
                n = 0
                for bb in frames[k][j]:
                    if bb is not None:
                        sel.append(bb)
                        n += 1
                counts.append(n)
            total += sum(len(x) for x in sel)
            blobs.append(self._pack_grouped(counts, sel))
        if total > self._DIRECT_MAX_BYTES:
            return None
        return ordered, blobs[0], blobs[1]

    def _unpack_kll_cells(self, blob, cells, qs):
        """Decode a ``kllQuantiles*Grouped`` result: per cell one
        occupancy byte, then (when occupied) one big-endian value per
        rank — ONE copy of the wire format's read side shared by the
        time-grouped and key-grouped asks (r11 review pass 8). Returns a
        list of per-cell value lists (``None`` per rank when empty)."""
        import struct

        m = len(qs)
        code = "q" if self.suffix == "bigint" else "d"
        out = []
        off = 0
        for _ in cells:
            occ = blob[off]
            off += 1
            if occ:
                out.append(list(struct.unpack_from(f">{m}{code}", blob, off)))
                off += 8 * m
            else:
                out.append([None] * m)
        return out

    @staticmethod
    def _bucket_dt(sec: int):
        """Epoch seconds → the naive-UTC datetime a collected TIMESTAMP
        bucket equals on the pinned UTC session (the frequency family's
        probe-pinned conversion)."""
        from datetime import datetime, timezone

        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(
            tzinfo=None
        )

    def _jdouble_array(self, vals):
        """Java ``double[]`` for rank/quantile argument lists (a handful
        of elements — the per-element gateway sets the grouped blob layout
        exists to avoid don't matter at this size)."""
        sc = self._df.sparkSession.sparkContext
        arr = sc._gateway.new_array(sc._jvm.double, len(vals))
        for i, v in enumerate(vals):
            arr[i] = float(v)
        return arr

    def _persist_meta(self) -> dict:
        """Ladder + freshness fields every family's ``save()`` meta must
        carry: a save/load cycle that dropped the stale mark would turn
        'refuse' into silent wrong answers on the standard streaming-
        recovery path (checkpoint → restart → load_indexes)."""
        return {
            "tiers": self.tiers,
            "stale_reason": getattr(self, "_stale_reason", None),
        }

    def _restore_meta(self, meta: dict) -> None:
        if meta.get("tiers"):
            self._tiers = [tuple(t) for t in meta["tiers"]]
        if meta.get("stale_reason"):
            self._stale_reason = meta["stale_reason"]

    # ------------------------------------------------------------- ladder
    @property
    def tiers(self) -> list[tuple[int, int]]:
        """Prefix compaction tiers ``[(end_sec, width)]`` — at most one
        entry (each compaction re-rolls the whole prefix), mirroring the
        Spark-backend wheel."""
        return getattr(self, "_tiers", [])

    def width_at(self, sec: int) -> int:
        """Bucket width in force at ``sec``."""
        for end, w in self.tiers:
            if sec < end:
                return w
        return self.bucket_seconds

    def _max_width(self, tiers=None) -> int:
        if tiers is None:
            tiers = self.tiers
        return max((w for _, w in tiers), default=self.bucket_seconds)

    @staticmethod
    def _epoch_sec(v) -> int | None:
        """Driver-side epoch seconds of a timestamp string/datetime (the
        same literal parser the engine uses — naive values are UTC, like
        the pinned session); None when unparseable."""
        if v is None:
            return None
        from ..functions.timestamps import parse_ts_literal

        lit = parse_ts_literal(str(v))
        return None if lit is None else lit.epoch_us // 1_000_000

    def _max_width_over(self, start=None, tiers=None) -> int:
        """Coarsest bucket width intersecting ``[start, ∞)`` — tiers are
        prefix spans, so only tiers ending AFTER the range start constrain
        an ask; a fine-granularity group-by over the uncompacted suffix
        stays answerable after the prefix compacts (the wheels'
        ``_max_width_in`` discipline). ``tiers`` overrides ``self.tiers``
        when the caller holds a coherent snapshot (the mirror box)."""
        if tiers is None:
            tiers = self.tiers
        if start is None:
            return self._max_width(tiers)
        sec = self._epoch_sec(start)
        if sec is None:  # unparseable: stay conservative
            return self._max_width(tiers)
        return max(
            (w for e, w in tiers if e > sec), default=self.bucket_seconds
        )

    def _width_expr(self) -> Column:
        """Per-row bucket width — the edge-inclusion slop the range
        filters need so a coarse bucket spanning the range start is still
        included whole."""
        out: Column = F.lit(self.bucket_seconds)
        # reversed: the FIRST matching tier (ascending ends) must win, so
        # earlier (coarser) tiers wrap outermost in the CASE chain
        for end, w in reversed(self.tiers):
            out = F.when(F.col("__sec") < F.lit(end), F.lit(w)).otherwise(out)
        return out

    def _bucket_expr(self, sec: Column) -> Column:
        """Tier-aware bucketing for ``merge_batch``: late rows landing in a
        compacted span bucket at the tier width."""
        out = sec if self.bucket_seconds == 1 else sec - (sec % self.bucket_seconds)
        # reversed: first matching tier wins (see _width_expr)
        for end, w in reversed(self.tiers):
            out = F.when(sec < F.lit(end), sec - (sec % F.lit(w))).otherwise(out)
        return out

    def _check_granularity(self, granularity, start=None, tiers=None) -> None:
        """Every stored bucket in the asked range must land whole in one
        output cell: the granularity must be tiled by the coarsest bucket
        width intersecting the range (``start=None`` = the whole table —
        conservative). A compacted span can never leak a wrong
        fine-grained distribution; a restriction to the fine suffix keeps
        fine group-bys answerable. ``tiers`` lets the direct path validate
        against ITS coherent box snapshot (r11 review pass 3: validating
        against live ``self.tiers`` and answering from the box lets a
        racing compaction slip a coarse bucket past a fine-granularity
        check)."""
        maxw = self._max_width_over(start, tiers)
        if isinstance(granularity, int):
            if granularity <= 0 or granularity % maxw:
                raise ValueError(
                    f"width {granularity!r} not tiled by {maxw}s buckets"
                )
            return
        g = str(granularity).lower()
        secs = _FIXED_GRAN_SECS.get(g, 86400)  # calendar: day-aligned
        if secs % maxw:
            raise ValueError(
                f"granularity {granularity!r} ({secs}s) not tiled by "
                f"{maxw}s buckets — compacted spans cannot split finer"
            )

    # --------------------------------------------------------- compaction
    def check_compact(self, cutoff_sec: int, width: int) -> None:
        """Validate ``(cutoff, width)`` against this rollup's ladder
        WITHOUT mutating anything — the all-or-nothing pre-check
        ``engine.compact_indexes`` runs before compacting any index."""
        if width <= 0 or width % self.bucket_seconds:
            raise ValueError(
                f"width {width} not a multiple of bucket {self.bucket_seconds}"
            )
        for _tend, tw in self.tiers:
            if width % tw:
                raise ValueError(
                    f"width {width} does not nest existing tier width {tw}"
                )
        cutoff = cutoff_sec - (cutoff_sec % width)
        for tend, _ in self.tiers:
            if cutoff < tend:
                raise ValueError(
                    f"cutoff {cutoff} precedes existing tier end {tend}"
                )

    def merge_batch(self, batch_df, time_column: str) -> None:
        """Merge a micro-batch of raw rows into the rollup — streaming
        maintenance. Serialized against :meth:`compact_before` under
        ``_mutate_lock`` (r11 review passes 3-4: a compaction racing a
        merge would publish a frame built from the PRE-merge state,
        silently dropping the batch's rows — and hoisting the wrapper
        here makes every family participate, including overrides).
        Families implement :meth:`_merge_batch_locked`; see each for the
        family's merge semantics."""
        from pyspark import StorageLevel

        with self._mutate_lock:
            self._merge_batch_locked(batch_df, time_column, StorageLevel)

    def compact_before(self, cutoff_sec: int, width: int) -> int:
        """Roll buckets older than ``cutoff_sec`` into ``width``-second
        buckets — one re-aggregation job over the cached rollup (sketch
        unions are exact algebra, so estimates over compacted spans match a
        fresh coarse build bit-for-bit within the pinned error bounds).
        Returns rows reclaimed. Repeated calls with growing cutoffs
        implement the hour→day→week ladder, bounding rollup rows (and
        persisted sidecar size) on endless streams."""
        from pyspark import StorageLevel

        with self._mutate_lock:
            return self._compact_before_locked(cutoff_sec, width, StorageLevel)

    def _compact_before_locked(self, cutoff_sec: int, width: int, StorageLevel) -> int:
        self.check_compact(cutoff_sec, width)
        cutoff = cutoff_sec - (cutoff_sec % width)
        if width == self.bucket_seconds and not self.tiers:
            return 0
        old = self._df
        in_span = F.col("__sec") < cutoff
        before = old.filter(in_span).count()
        if before == 0:
            return 0
        gcols = [(F.col("__sec") - (F.col("__sec") % width)).alias("__sec")]
        if self.key_column is not None:
            gcols.append(F.col("__key"))
        coarse = old.filter(in_span).groupBy(*gcols).agg(*self._union_agg_exprs())
        merged = (
            coarse.unionByName(old.filter(~in_span).select(*coarse.columns))
            .coalesce(self._SKETCH_CACHE_PARTITIONS)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        after = merged.filter(in_span).count()  # also materializes the cache
        # Atomic (frame, tiers, box) publication under the lock
        # _mirror_box holds around its read-check-create (r11 review
        # passes 1-2): ordering tricks cannot make a two-attribute pair
        # coherent against a reader preempted between the reads, and a
        # pre-published box can be clobbered by a racing identity-mismatch
        # rebuild. With both sides serialized, every direct ask observes
        # either the complete old state or the complete new one. The
        # published box is the new mirror holder (m=None collects
        # lazily) — no _drop_mirror, which would discard the pairing.
        # (The JOB path's _restrict still reads _df and tiers unlocked —
        # the pre-existing r10 exposure: at most the ONE ask whose filter
        # build lands inside this with-block can mis-pair them, and its
        # answer cannot persist — it memoizes into the pre-invalidate
        # dict, which the invalidate_asks below retires. Closing it fully
        # would thread a locked snapshot through every family's
        # _restrict; documented instead, matching the job path's
        # bounded-staleness contract.)
        new_tiers = [(cutoff, width)]
        with self._publish_lock:
            self._df = merged
            self._tiers = new_tiers
            self._mirror_ref = {
                "df": merged,
                "tiers": list(new_tiers),
                "m": None,
            }
        detach = getattr(self, "_detach_shared", None)
        if not (detach() if detach is not None else False):
            old.unpersist()
        self.invalidate_asks()
        return before - after
