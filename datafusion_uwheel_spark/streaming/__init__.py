"""Streaming index maintenance (Structured Streaming rollups + ANN appends)."""

from .maintenance import StreamingAnnMaintainer, StreamingWheelMaintainer

__all__ = ["StreamingWheelMaintainer", "StreamingAnnMaintainer"]
