"""Structured Streaming layer: the CDC consumer (consumer.py — the
idiomatic re-implementation of the reference's flagship entry point) and
event-time analytics (windows.py — watermarks, tumbling/sliding/session
windows, streaming dedup)."""

from pyspark.sql.streaming import StreamingQuery


def await_done(q: StreamingQuery, timeout: int = 600) -> None:
    """Block until ``q`` terminates; fail LOUDLY on timeout instead of
    letting the caller read a partial (or empty) output directory and
    return a plausible-but-wrong result (ADVICE r12). A query that
    terminated with an error already raises from ``awaitTermination``
    itself; the silent case this guards is the boolean ``False`` return
    on timeout."""
    finished = q.awaitTermination(timeout)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming query {q.id} did not terminate within {timeout}s; "
            "stopped it rather than reading partial output"
        )
