"""As-of (point-in-time) join — the time-series join Spark lacks natively.

For every left row, attach the single right row with the greatest
``right.on <= left.on`` (``direction="backward"``; ``"forward"`` mirrors it)
among rows with equal ``by`` keys, optionally within ``tolerance`` seconds —
the semantics of DuckDB's ``ASOF JOIN`` and pandas ``merge_asof``, which the
tests use as oracles.

The reference engine has no joins at all (SURVEY.md §2.2 "explicitly
absent"); this is part of the beyond-reference training-pipeline surface
(feature lookups "as of" an event time, point-in-time-correct label joins).

Scale design — the union-window plan, NOT a range join:

* A naive ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-per-row collapses
  to BroadcastNestedLoop / a per-row scan of the right history — quadratic in
  rows-per-key. Instead both sides are union'd and sorted once per key:
  ONE shuffle on ``by``, one in-partition sort, then ``last(..., ignorenulls)``
  over a running window fills each left row with the most recent right
  payload. Cost is O((|L|+|R|) log) per key — the same plan shape Spark uses
  for any window aggregate, fully whole-stage-codegen'd, no UDFs.
* Hot ``by`` keys skew the window sort exactly like any windowed aggregate;
  there is no salting escape (the running fill needs the whole key ordered).
  At 100 TB keep ``by`` at user/entity granularity, not e.g. a constant.
* With ``by=()`` the whole frame becomes ONE window partition (Spark will
  warn); only use that for small frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SRC = "__asof_is_right"
_RT = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = (),
    *,
    tolerance: float | None = None,
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time join; returns left columns + right payload columns
    (suffixed with ``suffix`` on name collision) + the matched right time as
    ``{on}{suffix}``.

    ``how="inner"`` drops left rows with no match (DuckDB ``ASOF JOIN``);
    ``how="left"`` keeps them with NULL payload (``ASOF LEFT JOIN``).
    ``tolerance`` (seconds) bounds ``|left.on - right.on|``; a match outside
    it counts as no match. Ties on ``right.on`` are broken arbitrarily —
    pre-aggregate the right side per (by, on) for determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by)
    for col in (on, *by):
        if col not in left.columns or col not in right.columns:
            raise ValueError(f"column {col!r} must exist on both sides")
    reserved = [c for c in left.columns if c.startswith("__asof_")]
    if reserved:
        raise ValueError(f"left columns collide with reserved prefix: {reserved}")

    rcols = [c for c in right.columns if c != on and c not in by]
    r = right.select(
        *by,
        F.col(on),
        F.lit(1).alias(_SRC),
        F.col(on).alias(_RT),
        *[F.col(c).alias(f"__asof_{c}") for c in rcols],
    )
    l = left.withColumn(_SRC, F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    # Ascending for backward (most recent right at-or-before), descending for
    # forward (earliest right at-or-after); right rows sort before left rows
    # at equal times so an exactly-simultaneous right row matches.
    t = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t, F.col(_SRC).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [_RT] + [f"__asof_{c}" for c in rcols]
    filled = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"{c}__f") for c in fill_cols]
    )
    out = filled.filter(F.col(_SRC) == 0)

    matched = F.col(f"{_RT}__f").isNotNull()
    if tolerance is not None:
        gap = F.abs(F.col(on).cast("double") - F.col(f"{_RT}__f").cast("double"))
        matched = matched & (gap <= float(tolerance))
    if how == "inner":
        out = out.filter(matched)

    def out_name(c: str) -> str:
        return f"{c}{suffix}" if c in left.columns else c

    proj = [F.col(c) for c in left.columns]
    proj.append(F.when(matched, F.col(f"{_RT}__f")).alias(out_name(on)))
    proj.extend(
        F.when(matched, F.col(f"__asof_{c}__f")).alias(out_name(c)) for c in rcols
    )
    return out.select(*proj)
