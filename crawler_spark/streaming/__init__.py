"""Structured Streaming operators (watermarked windows, stateful dedup)."""
