"""Range (point-in-interval) join — bucketized to stay an equi-join.

``points JOIN intervals ON p BETWEEN s AND e`` in stock Spark plans as a
BroadcastNestedLoopJoin (every point × every interval per key) — quadratic,
the classic 100 TB cliff. Here each interval is exploded onto the fixed-width
buckets it covers and each point maps to exactly ONE bucket, so the match
becomes a hash/sort-merge **equi-join** on ``(by..., bucket)`` with a cheap
residual refine. Because a point lives in a single bucket, each qualifying
(point, interval) pair meets exactly once — no post-join dedup shuffle.

Cost: |points| + Σ ceil(interval_len / bucket) join rows. Pick ``bucket``
near the median interval length: too small explodes long intervals into many
copies, too large piles unrelated intervals into shared buckets for the
refine to discard. Both degenerate gracefully (correctness never depends on
``bucket``); ``max_buckets_per_interval`` guards against a runaway explode
from an outlier interval.

The reference has no joins at all (SURVEY.md §2.2 "explicitly absent");
this is beyond-reference training-pipeline surface (event-in-window labels,
point-in-time feature intervals). DuckDB's inequality join is the test
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def _to_num(c: Column, dtype: str) -> Column:
    # timestamps bucket by epoch seconds (fractional); numerics as-is
    return c.cast("double") if dtype.startswith("timestamp") else c


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: tuple[str, ...] | list[str] = (),
    *,
    bucket: float,
    bounds: str = "[)",
    how: str = "inner",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (``bounds="[)"``, default) or
    ``start <= point <= end`` (``bounds="[]"``), matching ``by`` keys.

    Output: all point columns + the interval side's non-``by`` columns
    (suffixed ``_i`` on collision). ``how="left"`` keeps unmatched points
    with NULL interval columns. ``bucket`` is in the column's own units —
    seconds for timestamps. Intervals wider than
    ``bucket * max_buckets_per_interval`` raise at plan build (a silent
    explode there would OOM the shuffle; split such outliers first).
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be positive, got {bucket!r}")
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by)
    for col, side in ((point_col, points), (start_col, intervals), (end_col, intervals)):
        if col not in side.columns:
            raise ValueError(f"column {col!r} not found")
    for col in by:
        if col not in points.columns or col not in intervals.columns:
            raise ValueError(f"by column {col!r} must exist on both sides")

    ptype = dict(points.dtypes)[point_col]
    p = _to_num(F.col(point_col), ptype)
    s = _to_num(F.col(start_col), dict(intervals.dtypes)[start_col])
    e = _to_num(F.col(end_col), dict(intervals.dtypes)[end_col])

    b0 = F.floor(s / F.lit(float(bucket))).cast("long")
    b1 = F.floor(e / F.lit(float(bucket))).cast("long")
    # "[)" with an exactly bucket-aligned end never occupies the end bucket
    if bounds == "[)":
        b1 = F.when(e == b1 * F.lit(float(bucket)), b1 - 1).otherwise(b1)
    n_buckets = b1 - b0 + 1
    guard = F.when(
        n_buckets > max_buckets_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_buckets_per_interval}"
                    f" buckets of {bucket!r} — raise `bucket` or split the interval "
                    "(offending start: "
                ),
                F.col(start_col).cast("string"),
                F.lit(")"),
            )
        ),
    ).otherwise(F.sequence(b0, F.greatest(b0, b1)))

    icols = [c for c in intervals.columns if c not in by]
    iren = {c: (f"{c}_i" if c in points.columns else c) for c in icols}
    ivals = intervals.select(
        *by,
        *[F.col(c).alias(iren[c]) for c in icols],
        F.explode(guard).alias("__rj_b"),
    )
    pts = points.withColumn("__rj_b", F.floor(p / F.lit(float(bucket))).cast("long"))
    if how == "left":
        # Row identity for the anti-join below — NOT column equality, which
        # silently mishandles NULLs. monotonically_increasing_id is stable
        # here: both branches derive from this one frame and the id is a
        # deterministic function of the input partition layout.
        pts = pts.withColumn("__rj_id", F.monotonically_increasing_id())

    srn, ern = iren[start_col], iren[end_col]
    sr = _to_num(F.col(srn), dict(intervals.dtypes)[start_col])
    er = _to_num(F.col(ern), dict(intervals.dtypes)[end_col])
    refine = (p >= sr) & ((p <= er) if bounds == "[]" else (p < er))

    matched = pts.join(ivals, on=by + ["__rj_b"], how="inner").where(refine)
    if how == "left":
        missing = pts.join(
            matched.select("__rj_id").distinct(), on="__rj_id", how="left_anti"
        )
        matched = matched.unionByName(missing, allowMissingColumns=True)
        matched = matched.drop("__rj_id")
    return matched.drop("__rj_b")
