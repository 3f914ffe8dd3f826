"""As-of (most-recent-at-or-before) join.

For each left row, attach the single right row with the same key and
the greatest right timestamp <= the left timestamp — the canonical
event-stream enrichment ("which click preceded this purchase"). Spark
has no ASOF JOIN operator; a naive theta-join (l.ts >= r.ts) explodes
to O(n*m) per key. This re-expresses it as ONE shuffle:

  union(tag right=0, left=1) -> window partitionBy(key)
  orderBy(ts, tag, seq) -> last non-null right payload -> keep tag=1

Rows are sorted so every right row precedes the left rows it may serve
(equal timestamps: right first — "at-or-before" is inclusive), and
`last(..., ignorenulls)` carries the latest right payload forward. Cost
is exactly a groupBy-shuffle on the key plus a per-partition sort; no
join blow-up, no broadcast requirement on either side — the plan a
1000-executor cluster wants (skew on a hot key is the same skew a
groupBy(key) has, and salting does not apply because the window is
order-dependent; AQE's skew handling and the key's native cardinality
govern).

Ties among right rows with identical (key, ts) resolve to the largest
`seq_col` (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row's `seq_col`
    and payload columns as `asof_<name>` (null when no right row is at
    or before it). `seq_col` must be unique within the right side."""
    payload_cols = payload_cols or []
    rcols = [seq_col, *payload_cols]
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.col(seq_col).alias("_seq"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in (key_col, ts_col)],
    )
    l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[seq_col].dataType).alias("_seq"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left.columns if c not in (key_col, ts_col)],
    )
    win = (
        W.Window.partitionBy(key_col)
        .orderBy(ts_col, "_tag", "_seq")
        .rowsBetween(W.Window.unboundedPreceding, W.Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(win)
    out = (
        r.unionByName(l)
        .withColumn("_asof", carried)
        .where(F.col("_tag") == 1)
        .drop("_tag", "_seq", "_r")
    )
    for c in rcols:
        out = out.withColumn(f"asof_{c}", F.col("_asof")[c])
    return out.drop("_asof")
