"""Custom stateful streaming operator: cross-batch first-seen dedup.

A crawl feed re-delivers pages (refetches, mirror hosts); the training
pipeline wants each url exactly once, across micro-batches and across
restarts. File-source exactly-once covers whole files — this covers
row-level duplicates, with per-key state in the state store
(`applyInPandasWithState`), so dedup state survives restarts via the
stream checkpoint and scales horizontally with key partitioning.

State model: key = url, value = (first_ts epoch micros, n_seen). A url
row is emitted only on first sight; later sightings bump the duplicate
counter in state. At 10^12 documents the state store is the product of
active keys — callers should pre-bucket by recency or use a rolling
watermark TTL (timeoutConf) if the key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("cell_10km", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("warc_ts", kind="stable")
    n = len(rows)
    if state.exists:
        (first_us, seen) = state.get
        state.update((int(first_us), int(seen) + n))
        return iter(())  # duplicate url: emit nothing
    first = rows.iloc[0]
    state.update((int(pd.Timestamp(first["warc_ts"]).value // 1000), n))
    out = pd.DataFrame(
        {
            "url": [key[0]],
            "first_ts": [first["warc_ts"]],
            "cell_10km": [first["cell_10km"]],
        }
    )
    return iter([out])


def dedup_first_seen(points_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of (url, warc_ts, cell_10km, ...) ->
    append-mode stream of each url's FIRST sighting only."""
    return (
        points_stream.select("url", "warc_ts", "cell_10km")
        .groupBy("url")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ingest_dedup(
    spark: Any,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    glob: str | None = None,
):
    """Drain available files through the stateful dedup into parquet
    (AvailableNow); re-invocations resume the SAME state store, so urls
    seen in earlier invocations stay deduplicated."""
    from fgcspark.streaming.ingest import pages_stream_to_points, read_pages_stream

    pts = pages_stream_to_points(read_pages_stream(spark, input_dir, glob))
    q = (
        dedup_first_seen(pts)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
