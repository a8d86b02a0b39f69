"""Operators: wheel-index build/lookup plus LLM-data-pipeline transforms."""

from .lookup import STAR_AGGREGATION_ALIAS, WheelIndex
from .rollups import build_wheel_index, build_wheel_indices

__all__ = [
    "WheelIndex",
    "STAR_AGGREGATION_ALIAS",
    "build_wheel_index",
    "build_wheel_indices",
]
