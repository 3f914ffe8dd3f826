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


_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for dedup scoping and recrawl keys:
    lowercase scheme + normalized host (norm_host), default ports
    dropped (http:80 / https:443), empty path -> '/', fragment dropped,
    tracking params removed (utm_*, gclid, fbclid), remaining query
    params sorted. Pure codegen: parse_url + split/filter/array_sort
    higher-order expressions, no Python."""
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = norm_host(url)
    auth = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    path = F.parse_url(url, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), "/").otherwise(path)
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(""),
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB/ANSI twin of canonical_url (regex URL parsing instead of
    parse_url; same rules, same ordering)."""
    proto = f"lower(regexp_extract({url_expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    host = (
        "regexp_replace(regexp_replace(lower(regexp_replace("
        + auth
        + ", ':[0-9]+$', '')), '\\.$', ''), '^www\\.', '')"
    )
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} <> '' AND NOT (({proto} = 'http' AND {port} = '80')"
        f" OR ({proto} = 'https' AND {port} = '443')))"
    )
    path = f"regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    q = f"coalesce(regexp_extract({url_expr}, '\\?([^#]*)', 1), '')"
    params = (
        f"list_sort(list_filter(string_split({q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)(=|$)')))"
    )
    qs = f"array_to_string({params}, '&')"
    return (
        f"concat({proto}, '://', {host}, "
        f"CASE WHEN {keep_port} THEN concat(':', {port}) ELSE '' END, {path}, "
        f"CASE WHEN {qs} <> '' THEN concat('?', {qs}) ELSE '' END)"
    )


def latest_crawl(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Cross-snapshot recrawl dedup: one row per CANONICAL url, the
    newest crawl wins — the Common-Crawl-style "collapse N monthly
    snapshots into the freshest copy of each page" step. Ties on the
    timestamp break by the raw url string, so the survivor is
    engine-independent under any partitioning.

    Scale shape: a single hash aggregate on the canonical key with
    map-side partial max_by — rows are never sorted, there is no
    window (a row_number window would shuffle AND sort every snapshot
    row), no self-join, no second pass. Canonicalization itself is
    pure codegen (canonical_url)."""
    wins = F.struct(F.col(ts_col), F.col(url_col))
    return (
        pages.select(
            canonical_url(F.col(url_col)).alias("canon_url"),
            url_col,
            ts_col,
        )
        .groupBy("canon_url")
        .agg(F.max_by(wins, wins).alias("_w"))
        .select(
            "canon_url",
            F.col(f"_w.{url_col}").alias(url_col),
            F.col(f"_w.{ts_col}").alias(ts_col),
        )
    )


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
