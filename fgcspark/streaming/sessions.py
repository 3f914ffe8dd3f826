"""Streaming gap-based sessionization (session windows + watermark).

The streaming twin of `windows.sessionize` + the per-session rollup
(`event_sessions` query): events of one user merge into a session
while each new event arrives within `gap` of the session so far;
a session is emitted (append mode) once the watermark passes its end,
i.e. once no in-order event can extend it.

Semantics note (documented, tested): Spark's `session_window` merges
an event into a session iff its timestamp is STRICTLY less than
session_end = last_ts + gap, while the batch `sessionize` keeps the
session while `gap <= gap_s` (inclusive). The two differ only for
events at the exact boundary (ts == last_ts + gap); the equivalence
test uses boundary-free data and the batch/stream parity is asserted
through batch-mode `session_window`, which is semantics-identical by
construction.

Emission requires watermark progress: the last open session of the
stream's latest user cannot finalize until a later event advances the
watermark past its end. Batch-drain callers (AvailableNow) that need
ALL sessions flushed append a far-future heartbeat event and drop its
own session — the standard close-the-books pattern; the test does
exactly that.

At scale: one stateful shuffle on (user_id); state per key is the set
of open sessions (merged eagerly), eviction driven by the watermark —
this is Spark's native session-window state store path, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The session aggregation itself — works on a batch OR streaming
    DataFrame (same plan semantics, which is what the parity test
    leans on): per (user, session) event count, start, end."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_session_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    schema: str = EVENTS_SCHEMA,
):
    """Drain `input_dir` (parquet event files) through a watermarked
    session-window aggregation into `out_dir` (AvailableNow, append
    mode: only sessions sealed by the watermark are written)."""
    ev = spark.readStream.schema(schema).parquet(input_dir)
    agg = session_stats(ev.withWatermark("ts", watermark), gap=gap)
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
