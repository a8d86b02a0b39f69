"""Pure helper functions: timestamp math, portable hashing."""

from .timestamps import (
    GRANULARITIES,
    GRANULARITY_SECONDS,
    bucket_start_sec,
    parse_ts_literal,
)

__all__ = [
    "GRANULARITIES",
    "GRANULARITY_SECONDS",
    "bucket_start_sec",
    "parse_ts_literal",
]
