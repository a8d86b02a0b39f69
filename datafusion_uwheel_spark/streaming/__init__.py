"""Streaming index maintenance (Structured Streaming rollups)."""

from .maintenance import StreamingWheelMaintainer

__all__ = ["StreamingWheelMaintainer"]
