"""Structured Streaming surface: event-time windows, watermarks,
stateful dedup (SURVEY §2 B15-B16)."""
