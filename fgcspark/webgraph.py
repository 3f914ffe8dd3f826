"""Web link graph: outlink extraction -> host graph -> PageRank.

A Common-Crawl-style corpus is a graph, not just a bag of pages; host
authority (PageRank) is a standard quality prior for training-data
curation (e.g. harmonic-centrality / PR filtering of crawl frontiers).
The reference pipeline stops at per-page conversion (R/
finbif_geo_convert.R processes rows independently); the graph family
is a graft-side extension over the same page table.

Scale shape (10^12 pages, ~10^8 hosts):
- outlink extraction is a JVM ``regexp_extract_all`` over the decoded
  html column — whole-stage codegen, no Python, no shuffle;
- the host graph is ONE map-side-combined groupBy on (src, dst) —
  after which every PageRank iteration runs on the host-level table,
  orders of magnitude smaller than the page table;
- PageRank iterations are hash joins on the host key with per-round
  ``localCheckpoint`` (same O(1)-plan-depth discipline as
  ``fgcspark/cc.py``); the dangling-mass term is a one-row aggregate
  broadcast into the update expression, not a driver-side loop over
  rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fgcspark.urlops import norm_host

_OUTLINK = '<link rel="outlink" href="([^"]+)">'


def with_outlinks(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, outlink): one row per outlink href in the page head.
    Pages without links contribute no rows."""
    h = F.decode(F.col(html_col), "UTF-8")
    return (
        df.select("url", F.regexp_extract_all(h, F.lit(_OUTLINK), F.lit(1)).alias("_l"))
        .select("url", F.explode("_l").alias("outlink"))
    )


def host_linkgraph(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_host, dst_host, n_links): the host-level weighted link
    graph, self-links included (PageRank treats them like any edge)."""
    links = with_outlinks(df, html_col)
    return (
        links.select(
            norm_host(F.col("url")).alias("src_host"),
            norm_host(F.col("outlink")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    nodes: (host); edges: (src_host, dst_host, n_links).
    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u) * w(u,v)/outw(u)
                                + dangling_mass_t / N)

    Exactly `iters` synchronous iterations from the uniform vector —
    the fixed-iteration form is what the (unrolled-CTE) oracle mirrors.
    Total mass stays 1 by construction."""
    n_nodes = nodes.count()  # one scalar; the node table itself never collects
    frac = edges.groupBy("src_host").agg(F.sum("n_links").alias("_outw"))
    w = (
        edges.join(frac, "src_host")
        .select(
            "src_host",
            "dst_host",
            (F.col("n_links") / F.col("_outw")).alias("_frac"),
        )
        .repartition("dst_host")
        .localCheckpoint()
    )
    has_out = w.select(F.col("src_host").alias("host")).distinct()
    ranks = (
        nodes.select("host")
        .join(has_out.withColumn("_has_out", F.lit(True)), "host", "left")
        .select(
            "host",
            F.lit(1.0 / n_nodes).alias("rank"),
            F.coalesce("_has_out", F.lit(False)).alias("_has_out"),
        )
        .repartition("host")
        .localCheckpoint()
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # dangling mass rides the plan as a broadcast 1-row aggregate —
        # no driver collect, so each iteration is exactly ONE job (the
        # eager localCheckpoint below)
        dangling = ranks.where(~F.col("_has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            w.join(
                ranks.select(F.col("host").alias("src_host"), "rank"), "src_host"
            )
            .groupBy(F.col("dst_host").alias("host"))
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_in"))
        )
        new_ranks = (
            ranks.select("host", "_has_out")
            .join(contrib, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("_in", F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
                "_has_out",
            )
            .localCheckpoint()
        )
        prev, ranks = ranks, new_ranks
        prev.unpersist()
    w.unpersist()
    return ranks.select("host", "rank")


def host_nodes(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(host): every host that owns a page or receives a link."""
    src = df.select(norm_host(F.col("url")).alias("host"))
    dst = with_outlinks(df, html_col).select(norm_host(F.col("outlink")).alias("host"))
    return src.unionByName(dst).distinct()
