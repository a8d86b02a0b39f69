"""Temporal / min-max predicate extraction — the port of the reference's
``expr.rs`` (``datafusion-uwheel/src/expr.rs:38-257``) over parsed conjuncts.

Three extractors, mirroring ``UWheelExpr``'s three variants
(``expr.rs:18-35``):

* :func:`extract_wheel_range` — a time range ``[start, end)`` on the
  designated time column (``extract_wheel_range`` / ``extract_range_bounds``,
  ``expr.rs:38-66,198-207``).
* :func:`extract_min_max_predicate` — ``col ⊙ number`` for min/max pruning
  (``extract_min_max_predicate``, ``expr.rs:108-144``).
* :func:`split_temporal_filter` — split a conjunction into (range, residual
  filter) for keyed-index matching (``extract_filter_expr``,
  ``expr.rs:146-167``).

**Deliberate semantic deviation** (SURVEY.md §4.3.1): the reference treats
``>`` as ``>=`` and ``<=`` as ``<`` (``expr.rs:219-222``), which silently
mis-answers sub-bucket boundary queries. We record the range *and* whether it
is exactly ``[start, end)`` (``exact``); the router only rewrites exact,
second-aligned ranges and delegates everything else to Spark — always
correct, merely unaccelerated in the sloppy cases.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..functions.timestamps import MICROS_PER_SECOND, TsLiteral, parse_ts_literal
from .sqlparse import Comparison

__all__ = [
    "WheelRange",
    "MinMaxPredicate",
    "extract_wheel_range",
    "extract_min_max_predicate",
    "split_temporal_filter",
    "canonical_filter_key",
]


@dataclass(frozen=True)
class WheelRange:
    """Half-open time range in epoch microseconds."""

    start_us: int
    end_us: int
    exact: bool  # True iff built from `ts >= a AND ts < b`
    lo_op: str = ">="  # original lower operator: ">=" | ">"
    hi_op: str = "<"  # original upper operator: "<" | "<="

    @property
    def start_sec(self) -> int:
        return self.start_us // MICROS_PER_SECOND

    @property
    def end_sec(self) -> int:
        return self.end_us // MICROS_PER_SECOND

    @property
    def second_aligned(self) -> bool:
        return (
            self.start_us % MICROS_PER_SECOND == 0 and self.end_us % MICROS_PER_SECOND == 0
        )

    @property
    def routable(self) -> bool:
        """Rewrite-safety gate: exact semantics + alignment to the wheel's
        finest (second) dimension + non-empty (``start <= end`` validation as
        in ``WheelRange::new``, ``expr.rs:46-57``)."""
        return self.exact and self.second_aligned and self.start_us <= self.end_us

    @property
    def hybrid_routable(self) -> bool:
        """Boundary shapes the hybrid rewrite can answer *exactly*:
        second-aligned literals with a strict lower (``>``) and/or inclusive
        upper (``<=``, which BETWEEN desugars to). The reference accepts these
        by silently treating ``>`` as ``>=`` and ``<=`` as ``<``
        (``expr.rs:219-222``) — wrong at sub-second precision; we instead
        answer the full buckets from the wheel and the ≤1-bucket boundary
        slivers from a partition-pruned scan (see ``Router._try_hybrid``)."""
        return (
            not self.exact
            and self.second_aligned
            and self.start_us <= self.end_us
            and self.lo_op in (">=", ">")
            and self.hi_op in ("<", "<=")
        )


@dataclass(frozen=True)
class MinMaxPredicate:
    """``column ⊙ value`` with ⊙ ∈ {>, >=, <, <=} (``expr.rs:18-27``)."""

    column: str
    op: str
    value: float


def _ts_value(c: Comparison) -> TsLiteral | None:
    """Resolve a conjunct's literal as a timestamp, if it is one
    (``scalar_to_timestamp``, ``lib.rs:1178-1192``: RFC3339 strings, dates)."""
    if isinstance(c.value, tuple):  # IN lists are never a range bound
        return None
    if c.value_kind in {"string", "timestamp", "date"}:
        return parse_ts_literal(str(c.value))
    return None


def extract_wheel_range(
    conjuncts: list[Comparison], time_column: str
) -> WheelRange | None:
    """Extract a ``[start, end)`` range over ``time_column`` from AND-ed
    conjuncts. Needs both a lower (``>=``/``>``) and an upper (``<``/``<=``)
    temporal bound (``extract_range_bounds``: both bounds required,
    ``expr.rs:198-207``; single-bound test expects ``None``,
    ``expr.rs:317-328``). Equality on the time column yields ``None``
    (``expr.rs:351-356``)."""
    lower: tuple[TsLiteral, str] | None = None
    upper: tuple[TsLiteral, str] | None = None
    for c in conjuncts:
        if c.column != time_column:
            continue
        ts = _ts_value(c)
        if ts is None:
            return None  # non-temporal literal compared to the time column
        if c.op in {">=", ">"}:
            if lower is not None:
                return None
            lower = (ts, c.op)
        elif c.op in {"<", "<="}:
            if upper is not None:
                return None
            upper = (ts, c.op)
        else:
            return None  # '=' / '!=' on time column — not a range
    if lower is None or upper is None:
        return None
    (lo, lo_op), (hi, hi_op) = lower, upper
    exact = lo_op == ">=" and hi_op == "<"
    return WheelRange(
        start_us=lo.epoch_us, end_us=hi.epoch_us, exact=exact, lo_op=lo_op, hi_op=hi_op
    )


def extract_min_max_predicate(conjuncts: list[Comparison]) -> MinMaxPredicate | None:
    """Find a single numeric comparison suitable for min/max pruning
    (``extract_min_max_predicate``, ``expr.rs:108-144``; literal cast to f64
    as in ``lib.rs:629-637``)."""
    found: MinMaxPredicate | None = None
    for c in conjuncts:
        if c.op in {">", ">=", "<", "<="} and c.value_kind == "number":
            if found is not None:
                return None  # ambiguous — one predicate only, like the reference
            found = MinMaxPredicate(c.column, c.op, float(c.value))
    return found


def split_temporal_filter(
    conjuncts: list[Comparison], time_column: str
) -> tuple[WheelRange | None, list[Comparison]]:
    """Split into (temporal range, residual non-temporal conjuncts) — the
    reference's composite-filter split that selects keyed wheels
    (``extract_filter_expr``, ``expr.rs:146-167``)."""
    rng = extract_wheel_range(conjuncts, time_column)
    residual = [c for c in conjuncts if c.column != time_column]
    return rng, residual


def canonical_filter_key(conjuncts: list[Comparison]) -> str:
    """Canonical string for keyed-index lookup. The reference matches the
    *rendered* filter expression with the table qualifier stripped
    (``maybe_replace_table_name``, ``lib.rs:783-787``; key format
    ``lib.rs:164-173``). We additionally sort conjuncts so ``a AND b``
    matches ``b AND a``."""
    return " AND ".join(sorted(c.render() for c in conjuncts))
