"""Streaming exact dedup (the streaming twin of textops.exact_dedup /
latest-crawl recrawl dedup).

A crawl feed lands as files; each page's normalized-content
fingerprint (md5_56, the same 8-byte key the batch operator groups on)
is deduplicated with `dropDuplicatesWithinWatermark`: the first
occurrence of a fingerprint passes through, later copies arriving
within the watermark horizon are dropped, and state for fingerprints
older than the horizon is evicted by the watermark — which is exactly
what bounds state size at 100 TB (an unbounded-horizon streaming dedup
would accrete one state row per distinct document forever; the horizon
is the recrawl window you actually dedup against).

Determinism contract: WHICH physical row of a duplicate set passes
first depends on file/batch arrival order, so the emitted payload is
the fingerprint itself (identical for every member of a duplicate
set), making the drained output a pure set — batch-oracle comparable
regardless of scheduling. Semantics past the horizon (a copy arriving
after its original's state was evicted re-emits) are pinned in
tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fgcspark.streaming.ingest import read_pages_stream
from fgcspark.textops import md5_56


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon: str = "30 days",
    glob: str | None = None,
):
    """Drain `input_dir` (parquet page files) through watermarked
    streaming dedup into `out_dir` (one row per first-seen content
    fingerprint within the horizon; AvailableNow, append mode — the
    dedup operator emits survivors immediately, no close-the-books
    heartbeat needed)."""
    pages = read_pages_stream(spark, input_dir, glob)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    dd = (
        pages.withColumn("fp", md5_56(norm))
        .withWatermark("warc_ts", horizon)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    q = (
        dd.select("fp")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
