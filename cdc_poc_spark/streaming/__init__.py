"""Structured Streaming layer: the CDC consumer (consumer.py — the
idiomatic re-implementation of the reference's flagship entry point) and
event-time analytics (windows.py — watermarks, tumbling/sliding/session
windows, streaming dedup)."""
