"""Operators: wheel-index build/lookup plus LLM-data-pipeline transforms."""

from . import (
    bloomfilter,
    bloomjoin,
    dedup,
    model_scoring,
    multimodal,
    packing,
    semantic_dedup,
    similarity,
    text,
)
from .bloomjoin import bloom_anti_join, bloom_semi_join
from .asof import asof_join
from .rangejoin import range_join
from .sessions import session_agg, with_session_id
from .lookup import STAR_AGGREGATION_ALIAS, WheelIndex
from .rollup_table import SparkRollupWheel
from .rollups import build_wheel_index, build_wheel_indices

__all__ = [
    "WheelIndex",
    "asof_join",
    "range_join",
    "session_agg",
    "with_session_id",
    "SparkRollupWheel",
    "STAR_AGGREGATION_ALIAS",
    "build_wheel_index",
    "build_wheel_indices",
    "dedup",
    "model_scoring",
    "multimodal",
    "bloom_anti_join",
    "bloom_semi_join",
    "bloomfilter",
    "bloomjoin",
    "packing",
    "semantic_dedup",
    "similarity",
    "text",
]
