"""Streaming benchmark decontamination (the streaming twin of
textops.decontaminate).

A crawl feed lands as files; each micro-batch's documents are shingled
(stateless explode), hit against the BROADCAST distinct eval n-gram
set (stream-static join — the eval benchmark is tiny and static next
to the stream), and per-document hit counts are finalized by a
watermarked event-time-window aggregation. The corpus never shuffles
by shingle, exactly like the batch op; the only stateful operator is
the (window, id) count whose state the watermark evicts — bounded by
documents-per-window, not stream length.

Emission requires watermark progress (append mode): batch-drain
callers append a far-future heartbeat row in its own LAST file
(maxFilesPerTrigger=1 — the watermark only advances between batches).
The heartbeat's text MUST produce at least one shingle: although
withWatermark is applied on the source, Spark collects the event-time
stats after the collapsed shingle projection, so a row whose shingle
array explodes to nothing never registers its event time (measured:
a sub-width text left the watermark at the previous batch's value and
zero windows sealed). Use a sentinel shingle that cannot occur in the
eval set and drop the heartbeat's id from the drained output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fgcspark.textops import shingles

DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def streaming_decontaminate(
    spark: SparkSession,
    input_dir: str,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    window: str = "1 day",
    watermark: str = "0 seconds",
    schema: str = DOCS_STREAM_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str = "ts",
):
    """Drain `input_dir` (parquet doc files with an event-time column)
    through the stream-static decontamination scan into `out_dir`:
    one (window_start, id, n_hits) row per contaminated document per
    event-time window, written once the watermark seals the window."""
    ev = shingles(eval_docs, n, id_col, text_col).select("shingle").distinct()
    # one file per micro-batch: the watermark only advances BETWEEN
    # batches, so the close-the-books heartbeat file must land in a
    # batch AFTER the data it seals
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    sh = shingles(
        stream.withWatermark(time_col, watermark),
        n,
        id_col,
        text_col,
        keep=(time_col,),
    )
    agg = (
        sh.join(F.broadcast(ev), "shingle")
        .groupBy(F.window(time_col, window).alias("_w"), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("_w.start").alias("window_start"), id_col, "n_hits")
    )
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
