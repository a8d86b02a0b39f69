"""Streaming index maintenance (Structured Streaming rollups)."""
