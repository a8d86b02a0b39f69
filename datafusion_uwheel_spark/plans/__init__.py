"""Plan layer: SQL shape parsing, predicate extraction, query routing."""

from .predicates import (
    MinMaxPredicate,
    WheelRange,
    canonical_filter_key,
    extract_min_max_predicate,
    extract_wheel_range,
    split_temporal_filter,
)
from .router import RouteDecision, Router
from .sqlparse import ParseError, parse_conjunction, parse_select

__all__ = [
    "WheelRange",
    "MinMaxPredicate",
    "extract_wheel_range",
    "extract_min_max_predicate",
    "split_temporal_filter",
    "canonical_filter_key",
    "RouteDecision",
    "Router",
    "ParseError",
    "parse_select",
    "parse_conjunction",
]
