"""Structured Streaming operators: streaming color correction, watermarked
windowed aggregation, custom stateful per-cell counters."""
