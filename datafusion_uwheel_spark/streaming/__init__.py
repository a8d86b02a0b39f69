"""Streaming index maintenance (Structured Streaming rollups + ANN appends)."""

from .caps import stream_cap_per_key
from .maintenance import StreamingAnnMaintainer, StreamingWheelMaintainer

__all__ = [
    "StreamingAnnMaintainer",
    "StreamingWheelMaintainer",
    "stream_cap_per_key",
]
