"""URL normalization + host-level crawl aggregation (webtext ops).

A Common-Crawl-scale training pipeline buckets pages by registrable
host for QA and per-site policies (robots, dedup scope, spam domains).
These are pure built-in-expression ops: `parse_url` + regexp inside
whole-stage codegen, one hash-aggregate shuffle on the host key — no
Python in the hot path.

Host skew is the canonical Zipf case (a few giant hosts dominate real
crawls); the aggregation is all algebraic/partial-aggregable (count,
count-distinct via Spark's expand + two-phase plan), so map-side
combine absorbs the skew. For 100 TB use `approx=True` to replace the
exact distinct counts with HLL sketches (constant-size partial state;
the exact variant exists for oracle parity at test scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_host(url: Column) -> Column:
    """Normalized host of a URL: lowercase, leading 'www.' stripped,
    trailing dot dropped (DNS-root form)."""
    h = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(F.regexp_replace(h, r"\.$", ""), r"^www\.", "")


def host_stats(points: DataFrame, approx: bool = False) -> DataFrame:
    """Per-host crawl stats over the geo-extracted page table
    (needs url, lang, cell_100km): page count, distinct languages,
    distinct 100 km tiles (geographic spread of the host's geotags)."""
    nd = F.approx_count_distinct if approx else F.count_distinct
    return points.groupBy(norm_host(F.col("url")).alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages"),
        nd(F.col("lang")).alias("n_langs"),
        nd(F.col("cell_100km")).alias("n_cells_100km"),
    )
