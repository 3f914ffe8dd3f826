"""Scalable total-order windows.

The reference's `n`/`skip` chunking (S1, api.R:144-162) needs a GLOBAL
row number in key order. `Window.orderBy(key)` without a partitionBy
is semantically right but physically wrong at scale: Spark collapses
the whole table into ONE task. This module computes the same numbering
in two passes, all stages parallel:

1. range-repartition + sort within partitions on the key (the same
   exchange a global sort would do — partitions hold disjoint,
   ordered key ranges);
2. count rows per partition (tiny job over the sorted data), turn the
   counts into cumulative offsets on the driver (P integers);
3. one narrow mapPartitions pass emits offset[pid] + local position.

Ties: rows with equal keys get distinct but arbitrary numbers within
the tie group (same as Window.orderBy). Pass a unique key for full
determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number in `order_col` order without a
    single-task global window."""
    import pandas as pd

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # materialize the sorted layout ONCE: the counts job and the
    # numbering job must see byte-identical partitions, and a re-planned
    # range exchange does not guarantee identical sampled boundaries
    # across jobs (observed divergence under AQE). localCheckpoint pins
    # the blocks; the full-sort materialization is inherent to a global
    # total order anyway.
    ranged = (
        df.repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    schema = ranged.drop("_pid").schema.add(out_col, "long")

    def number(batches):
        pos = 0
        off = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off is None:
                off = bc.value[int(pdf["_pid"].iloc[0])]
            rn = pd.Series(range(off + pos + 1, off + pos + 1 + len(pdf)))
            pos += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[out_col] = rn.values
            yield out

    # mapInPandas batches iterate a partition IN ORDER, so the local
    # cumulative position reproduces the within-partition sort rank
    return ranged.mapInPandas(number, schema)


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps stay <= gap_s seconds. One shuffle
    on the key; session numbering is a lag + running sum inside the
    same window sort (no second pass, no UDF). Gap arithmetic is in
    integer MICROSECONDS (unix_micros) so the boundary decision is
    exact and engine-independent; `seq_col` breaks timestamp ties
    deterministically. Adds `session_id` (1-based per key, time
    order)."""
    from pyspark.sql import window as W

    w = W.Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    # NTZ timestamps cast through the session tz (engine pins UTC), so
    # micros are the naive wall-clock epoch both here and in DuckDB
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(W.Window.unboundedPreceding, W.Window.currentRow)
        ),
    )


def chunk_window(
    df: DataFrame, order_col: str, skip: int, n: int, num_partitions: int | None = None
) -> DataFrame:
    """Rows skip+1 .. skip+n of df in order_col order (the reference's
    n/skip chunk), numbering computed scalably."""
    rn = global_row_number(df, order_col, num_partitions=num_partitions)
    return rn.where((F.col("_rn") > skip) & (F.col("_rn") <= skip + n)).drop("_rn")
