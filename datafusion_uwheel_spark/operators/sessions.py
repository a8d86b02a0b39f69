"""Sessionization — gap-based event grouping (the conversation/visit
segmentation step of a training-data pipeline; also SURVEY.md §2.2's
"session windows", which the reference lacks entirely).

Two forms over the same semantics:

* :func:`with_session_id` — row-level labels via the gap-and-islands plan:
  ``lag`` marks session starts, a running ``sum`` numbers them. One shuffle
  on ``by`` + one in-partition sort (a single Window exec, codegen'd) — the
  same cost envelope as any windowed aggregate, no UDFs.
* :func:`session_agg` — per-session aggregates via Spark's native
  ``F.session_window`` (works in batch as well as streaming), so the
  streaming story is exactly the built-in operator.

Both use Spark's session-window merge rule: an event extends its session iff
``ts - prev_ts <= gap`` (inclusive — two events exactly ``gap`` apart share a
session; verified empirically against ``F.session_window``, which merges
touching windows). The tests pin row-level ≡ native ``session_window`` and
both against a DuckDB gap-and-islands oracle.

Scale note: hot ``by`` keys serialize into one window partition — keep keys
at user/session-owner granularity. ``by=()`` collapses to a single partition;
only for small frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_session_id", "session_agg"]


def with_session_id(
    df: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = (),
    gap: float = 1800.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Label every row with a 0-based per-key session ordinal.

    A session ends when the next event (same ``by`` keys, ordered by ``on``)
    arrives strictly more than ``gap`` seconds later. Ties on ``on`` share a
    session.
    """
    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")
    by = list(by)
    if session_col in df.columns:
        raise ValueError(f"column {session_col!r} already exists")
    order = Window.partitionBy(*by).orderBy(F.col(on))
    prev = F.lag(F.col(on)).over(order)
    is_new = F.when(
        prev.isNull() | (F.col(on).cast("double") - prev.cast("double") > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, (F.sum(is_new).over(running) - F.lit(1)).cast("long")
    )


def session_agg(
    df: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = (),
    gap: float = 1800.0,
    watermark: str | None = None,
) -> DataFrame:
    """Per-session aggregates via native ``F.session_window``: one row per
    session with ``(by..., session_start, session_end, n_events,
    duration_sec)``.

    ``session_start``/``session_end`` are the observed first/last event times
    (NOT the window's ``end``, which Spark pads by ``gap``); ``duration_sec``
    is their span, 0.0 for single-event sessions.

    Works unchanged on a streaming frame: pass ``watermark`` (e.g.
    ``"10 minutes"``) and write with ``outputMode("append")`` — a session is
    emitted exactly once, when the watermark passes its close (last event +
    gap). On a batch frame the watermark is a no-op.
    """
    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")
    by = list(by)
    if watermark is not None:
        df = df.withWatermark(on, watermark)
    sw = F.session_window(F.col(on), f"{gap} seconds")
    out = (
        df.groupBy(sw.alias("__sw"), *[F.col(c) for c in by])
        .agg(
            F.min(on).alias("session_start"),
            F.max(on).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sw")
        .withColumn(
            "duration_sec",
            F.col("session_end").cast("double") - F.col("session_start").cast("double"),
        )
    )
    return out.select(*by, "session_start", "session_end", "n_events", "duration_sec")
