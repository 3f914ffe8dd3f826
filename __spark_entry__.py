"""Driver contract for the spark-graft builder (PySpark target).

Engine: fgcspark — PySpark-native spatial-join + tiling engine
re-expressing luomus/finbif-geo-convert (see SURVEY.md).

Geo queries run over the deterministic synthetic `pages` dataset
(fgcspark/synth/pages.py, seed 42, FIXTURES.md §1) generated under
/root/repo/data/{sf}; their oracles read the generator's independent
brute-force truth parquets via read_parquet(). Relational/training
queries run over the driver's testdata views with plain SQL oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_DATA = "/root/repo/data"
ORACLE_SCALE = "sf0.01"  # the driver's correctness scale


def _geo_dir(sf_dir: str) -> str:
    """Map the driver's sf dir to our pages dataset dir (generating it
    on first use — deterministic, seed 42)."""
    from fgcspark.synth.pages import SCALE_ROWS, ensure

    scale = Path(sf_dir).name
    if scale not in SCALE_ROWS:
        scale = ORACLE_SCALE
    return str(ensure(scale, Path(GEO_DATA)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract geotags from pages html, project to EPSG:3067,
    assign 10 km FinBIF tiles, count docs per tile."""
    from fgcspark.pipeline import tile_counts

    return tile_counts(spark, _geo_dir("/root/testdata/sf0.001"), size_km=10)


# ---------------------------------------------------------------------------
# geo queries (pages dataset)
# ---------------------------------------------------------------------------


def _q_extract(spark, sf_dir):
    from fgcspark.extract import with_extracted
    from fgcspark.pipeline import load_pages

    df = with_extracted(load_pages(spark, _geo_dir(sf_dir)))
    return df.select("url", "extracted_text")


def _q_points(spark, sf_dir):
    from fgcspark.pipeline import geo_pipeline

    return geo_pipeline(spark, _geo_dir(sf_dir), geo="point", crs="wgs84").select(
        "url", "geo_wkt"
    )


def _q_footprint_types(spark, sf_dir):
    from fgcspark.pipeline import geo_pipeline

    return geo_pipeline(spark, _geo_dir(sf_dir), geo="footprint", crs="wgs84").select(
        "url", "geom_type"
    )


def _q_bbox(spark, sf_dir):
    from fgcspark.pipeline import geo_pipeline

    return geo_pipeline(spark, _geo_dir(sf_dir), geo="bbox", crs="wgs84").select(
        "url", F.col("geo_wkt").alias("bbox_wkt")
    )


def _q_tiles(spark, sf_dir):
    from fgcspark.pipeline import pages_to_points

    return pages_to_points(spark, _geo_dir(sf_dir)).select(
        "url", "cell_1km", "cell_10km", "cell_50km", "cell_100km"
    )


def _q_tile_counts(spark, sf_dir):
    from fgcspark.pipeline import tile_counts

    return tile_counts(spark, _geo_dir(sf_dir), size_km=10)


def _q_tile_counts_salted(spark, sf_dir):
    """Skew-safe two-stage aggregation: pre-aggregate on (cell, salt)
    so one hot cell (20 % of all rows by construction) spreads over 16
    reducers before the final combine — the north_rule's explicit
    hot-cell salting, checked for exactness against the plain oracle."""
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    salted = pts.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(16)))
    partial = salted.groupBy(F.col("cell_10km").alias("cell"), "_salt").agg(
        F.count(F.lit(1)).alias("c")
    )
    return partial.groupBy("cell").agg(F.sum("c").cast("long").alias("n_docs"))


def _q_pages_cells_jvm(spark, sf_dir):
    """Zero-Python spatial core: extract -> Catalyst TM35FIN projection
    -> tiles, all whole-stage codegen (numpy UDF only for the ~0.3 %
    footprint-centroid fallback rows). Cell ids must equal the numpy
    pipeline's (kernel divergence < 1e-6 m, boundary clearance tested)."""
    from fgcspark.pipeline import pages_to_points_jvm

    return pages_to_points_jvm(spark, _geo_dir(sf_dir)).select(
        "url", "cell_1km", "cell_10km", "cell_50km", "cell_100km"
    )


def _q_tile_rollup(spark, sf_dir):
    """Multi-resolution tile rollup: ONE shuffle over the page table
    builds the 10 km aggregate; 50/100 km levels are derived from that
    aggregate by integer bucket arithmetic (hypertable continuous-
    aggregate shape — the 100 TB input is scanned exactly once)."""
    from fgcspark.pipeline import tile_counts
    from fgcspark.tiles import tile_rollup

    finest = tile_counts(spark, _geo_dir(sf_dir), size_km=10)
    return tile_rollup(finest, base_km=10, sizes=(10, 50, 100))


def _q_host_stats(spark, sf_dir):
    """Per-host crawl QA aggregate (normalized host key): page count,
    distinct languages, distinct 100 km tiles."""
    from fgcspark.pipeline import pages_to_points
    from fgcspark.urlops import host_stats

    pts = pages_to_points(spark, _geo_dir(sf_dir)).select("url", "lang", "cell_100km")
    return host_stats(pts)


def _q_bbox_range_join(spark, sf_dir):
    """Spatial window query: pages inside each of 64 deterministic
    viewport rectangles (broadcast cover + codegen containment)."""
    from fgcspark.joins.bbox import bbox_range_join
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir)).select("url", "e", "n")
    return bbox_range_join(spark, pts, _bench_rects())


def _bench_rects():
    """64 deterministic 40x40 km viewports on an 8x8 lattice across the
    working window — pure constants, mirrored verbatim in the oracle."""
    rects = []
    for i in range(64):
        x0 = 110000.0 + (i % 8) * 75000.0
        y0 = 6650000.0 + (i // 8) * 135000.0
        rects.append((i, x0, y0, x0 + 40000.0, y0 + 40000.0))
    return rects


def _q_cell_ring_counts(spark, sf_dir):
    """k-ring disk query: total docs within Chebyshev distance 2 of
    each of the 20 hottest 10 km cells (deterministic tie-break)."""
    from fgcspark.cells.grid import ring_counts
    from fgcspark.pipeline import tile_counts

    # eager localCheckpoint on the base aggregate: `hot` and the join
    # side both read it — one extract scan, no cache-write overhead
    # (see _q_hex_ring_counts for the measured comparison vs persist)
    counts = tile_counts(spark, _geo_dir(sf_dir), size_km=10).localCheckpoint()
    hot = counts.orderBy(F.desc("n_docs"), F.asc("cell")).limit(20)
    return ring_counts(hot, counts, k=2)


def _q_outlink_edges(spark, sf_dir):
    """Outlink extraction from page head (url, outlink) — pure JVM
    regexp_extract_all over the decoded html, no Python, no shuffle."""
    from fgcspark.webgraph import with_outlinks

    d = _geo_dir(sf_dir)
    return with_outlinks(spark.read.parquet(f"{d}/pages.parquet"))


def _q_host_linkgraph(spark, sf_dir):
    """Host-level weighted link graph (src_host, dst_host, n_links):
    one map-side-combined groupBy over the extracted edges."""
    from fgcspark.webgraph import host_linkgraph

    d = _geo_dir(sf_dir)
    return host_linkgraph(spark.read.parquet(f"{d}/pages.parquet"))


def _q_host_pagerank(spark, sf_dir):
    """Weighted PageRank over the host graph (10 synchronous damped
    iterations, uniform dangling-mass redistribution). Oracle: the
    identical fixed-iteration recurrence unrolled as 10 CTE stages in
    DuckDB — float summation-order differences are ~1e-15 relative,
    far inside the driver's 1e-9 rounding."""
    from fgcspark.webgraph import host_linkgraph, host_nodes, pagerank

    d = _geo_dir(sf_dir)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    return pagerank(host_nodes(pages), host_linkgraph(pages))


def _q_focal_density(spark, sf_dir):
    """Binomial kernel-density surface over the 10 km tile raster
    (separable two-pass convolution in exact long arithmetic). Oracle:
    the direct (2k+1)^2 weighted neighborhood sum in DuckDB — equality
    is exact because the kernel is an integer outer product."""
    from fgcspark.pipeline import tile_counts
    from fgcspark.tiles import focal_density

    counts = tile_counts(spark, _geo_dir(sf_dir), size_km=10)
    return focal_density(counts)


def _q_dbscan_cells(spark, sf_dir):
    """Grid DBSCAN (50 km cells, density threshold 0.3 % of the corpus
    — exactly 30 docs/cell at the oracle scale): contiguous dense
    regions of the grid — core cells labelled by frontier min-label
    propagation over the 8-neighborhood, border cells deterministically
    assigned to the minimum adjacent cluster. The fractional threshold
    keeps the cluster structure (and round count) scale-invariant when
    the same geography carries 10-1000x the documents. Oracle:
    recursive-CTE transitive closure of the same adjacency in DuckDB
    (min_pts = 30 at sf0.01 by construction)."""
    from fgcspark.cells.dbscan import dbscan_cells
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    return dbscan_cells(pts, size_km=50, min_pts=None, min_frac=0.003)


def _q_top_hosts_per_cell(spark, sf_dir):
    """Top-3 hosts by page count inside each 100 km cell (window
    rank over a pre-aggregated (cell, host) table — the shuffle is on
    the aggregate, not the base table; deterministic tie-break)."""
    from pyspark.sql import Window

    from fgcspark.pipeline import pages_to_points
    from fgcspark.urlops import norm_host

    pts = pages_to_points(spark, _geo_dir(sf_dir)).select("url", "cell_100km")
    agg = pts.groupBy(
        F.col("cell_100km").alias("cell"), norm_host(F.col("url")).alias("host")
    ).agg(F.count(F.lit(1)).alias("n_pages"))
    w = Window.partitionBy("cell").orderBy(F.desc("n_pages"), F.asc("host"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("cell", "host", "n_pages", "rank")
    )


def _q_lang_cell_rollup(spark, sf_dir):
    """OLAP rollup: page counts by (lang, cell_100km), by lang, and
    grand total in ONE pass (Spark rollup == SQL ROLLUP grouping sets;
    aggregated-out keys sentineled '*' so rows sort/hash cleanly)."""
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir)).select("lang", "cell_100km")
    return (
        pts.rollup("lang", "cell_100km")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.coalesce(F.col("lang"), F.lit("*")).alias("lang"),
            F.coalesce(F.col("cell_100km"), F.lit("*")).alias("cell"),
            "n_pages",
        )
    )


def _q_cell_terms(spark, sf_dir):
    """Geo x webtext fusion: top-5 TF-IDF-distinctive terms per 50 km
    cell (regional vocabulary drift / toponym mining). Scores rounded
    to 6 decimals in BOTH engines before ranking so libm ulp can flip
    neither the hash nor the order (the unigram_logprob contract)."""
    from fgcspark.geotext import cell_distinctive_terms
    from fgcspark.pipeline import pages_to_points

    return cell_distinctive_terms(pages_to_points(spark, _geo_dir(sf_dir)), k=5)


def _q_cell_lang_entropy(spark, sf_dir):
    """Shannon entropy of the language mix per 50 km cell — the
    linguistic-diversity surface over the map."""
    from fgcspark.geotext import cell_lang_entropy
    from fgcspark.pipeline import pages_to_points

    return cell_lang_entropy(pages_to_points(spark, _geo_dir(sf_dir)))


def _q_species_range(spark, sf_dir):
    """Entity range map: pages/cells/bbox per species token mentioned
    in page text — 'species distribution from the web'. Exact
    order-independent aggregates only (no fp-summation surface)."""
    from fgcspark.geotext import entity_range
    from fgcspark.pipeline import pages_to_points

    return entity_range(pages_to_points(spark, _geo_dir(sf_dir)))


def _q_getis_ord(spark, sf_dir):
    """Getis-Ord Gi* hot-spot z-scores over the 10 km tile raster —
    'where is web activity anomalously clustered'. All spatial sums
    are exact integer aggregates; the z-score is one closed-form
    scalar per cell, rounded to 6 decimals in both engines."""
    from fgcspark.hotspots import getis_ord
    from fgcspark.pipeline import pages_to_points

    return getis_ord(pages_to_points(spark, _geo_dir(sf_dir)), size_km=10)


def _q_morans_i(spark, sf_dir):
    """Global Moran's I of the 10 km raster under queen weights,
    reduced to integer pair-aggregates (no float accumulation)."""
    from fgcspark.hotspots import morans_i
    from fgcspark.pipeline import pages_to_points

    return morans_i(pages_to_points(spark, _geo_dir(sf_dir)), size_km=10)


def _q_species_cooccurrence(spark, sf_dir):
    """Spatial co-occurrence: shared-50km-cell count per unordered
    species pair, from the distinct presence table (post-aggregation
    self-join — vocabulary-sized, not corpus-sized)."""
    from fgcspark.geotext import entity_cooccurrence
    from fgcspark.pipeline import pages_to_points

    return entity_cooccurrence(pages_to_points(spark, _geo_dir(sf_dir)))


def _q_zorder(spark, sf_dir):
    """Morton/Z-order clustering key per page (1 km cells) — the sort
    key a clustered spatial write lays files out by. Pure integer
    bit-spreading inside codegen."""
    from fgcspark.cells.zorder import zorder_key
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    return pts.select("url", zorder_key(F.col("e"), F.col("n")).alias("zorder"))


def _q_pip(spark, sf_dir):
    from fgcspark.joins.pip import pip_join
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    return pip_join(spark, pts, polys)


def _q_pip_partitioned(spark, sf_dir):
    """Broadcast-free PIP twin: distributed cover table (rings carried
    as WKB through the cell equi-join), same exact output as pip_join —
    the path for polygon layers too large for a driver-side index."""
    from fgcspark.joins.pip import pip_join_partitioned
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    return pip_join_partitioned(spark, pts, polys)


def _q_fp_join(spark, sf_dir):
    """Footprint x layer INTERSECTS join (polygon/line/point vs layer
    polygons) — the full-geometry extension of the PIP join; oracle is
    the generator's forward brute-force golden (independent parametric
    segment test + ray-cast, no cell prefilter)."""
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join
    from fgcspark.pipeline import load_pages

    d = _geo_dir(sf_dir)
    pages = with_extracted(load_pages(spark, d))
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    return footprint_join(spark, pages, polys)


def _q_fp_join_partitioned(spark, sf_dir):
    """Distributed-layer twin of fp_layer_join (cell cogroup +
    reporting-cell dedup, no broadcast); same forward golden."""
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join_partitioned
    from fgcspark.pipeline import load_pages

    d = _geo_dir(sf_dir)
    pages = with_extracted(load_pages(spark, d))
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    return footprint_join_partitioned(spark, pages, polys)


def _q_pip_counts(spark, sf_dir):
    return (
        _q_pip(spark, sf_dir)
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def _q_s2_cells(spark, sf_dir):
    """S2-style 64-bit hierarchical cell ids (level 12 = 512 m) plus
    their level-10 parents — pure integer arithmetic, no UDF."""
    from fgcspark.cells import s2lite as s2
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    cid = s2.cell_id_col(F.col("e"), F.col("n"), 12)
    return pts.select(
        "url",
        cid.alias("s2_l12"),
        s2.parent_col(cid, 2).alias("s2_l10"),
    )


def _q_s2_cell_counts(spark, sf_dir):
    return (
        _q_s2_cells(spark, sf_dir)
        .groupBy("s2_l10")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_layer_stats(spark, sf_dir):
    """Planar area + perimeter of every polygon-layer feature (holes
    subtracted, MULTIPOLYGON parts summed, perimeter over all rings).
    Batch parse -> one-call batch projection -> shoelace per feature
    (fgcspark.geom.layer_analytics); oracle is the generator's forward
    golden through the same kernel path (independently property-tested
    vs exact rational arithmetic)."""
    from fgcspark.geom.layer_analytics import layer_stats

    d = _geo_dir(sf_dir)
    return layer_stats(spark.read.parquet(f"{d}/polygons.parquet"))


def _q_layer_hulls(spark, sf_dir):
    """Convex hull WKT of every layer feature (monotone chain over the
    projected vertices). Oracle: the generator's forward golden through
    the same kernel path (hull properties independently verified in
    tests/test_hull.py)."""
    from fgcspark.geom.layer_analytics import layer_hulls

    d = _geo_dir(sf_dir)
    return layer_hulls(spark.read.parquet(f"{d}/polygons.parquet"))


def _q_layer_simplify(spark, sf_dir):
    """Douglas-Peucker simplification of the polygon layer (eps=500 m
    in the projected plane): per feature the simplified WKT plus
    before/after vertex counts. Oracle: the generator's forward golden
    (layer_simplify.parquet) through the same kernel path; DP itself is
    additionally property-tested (tests/test_simplify.py: vertex-subset,
    ring validity, every-vertex-within-eps)."""
    from fgcspark.geom.layer_analytics import layer_simplify

    d = _geo_dir(sf_dir)
    return layer_simplify(spark.read.parquet(f"{d}/polygons.parquet"), eps=500.0)


def _q_geohash(spark, sf_dir):
    """Standard geohash (p=6) of each coordinate-carrying page — the
    geodetic cell key family next to the metric s2lite/hex grids.
    Zero-Python plan (regex extract + CAST + interleave arithmetic);
    the oracle CASTs the same source strings and runs the identical
    formula, so parity is exact (fallback-centroid rows are excluded
    by contract: their lon/lat never existed as decimal strings)."""
    from fgcspark.cells.geohash import geohash
    from fgcspark.extract import with_extracted
    from fgcspark.pipeline import load_pages

    df = with_extracted(load_pages(spark, _geo_dir(sf_dir)))
    return df.where(F.col("lon").isNotNull() & F.col("lat").isNotNull()).select(
        "url", geohash(F.col("lon"), F.col("lat"), 6).alias("gh6")
    )


def _q_geohash_counts(spark, sf_dir):
    from fgcspark.cells.geohash import geohash
    from fgcspark.extract import with_extracted
    from fgcspark.pipeline import load_pages

    df = with_extracted(load_pages(spark, _geo_dir(sf_dir)))
    return (
        df.where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .groupBy(geohash(F.col("lon"), F.col("lat"), 5).alias("gh5"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_quadkey(spark, sf_dir):
    """Web-Mercator quadkey (z=12, ~10 km tiles) of each
    coordinate-carrying page — the slippy-map cell family next to
    geohash. Zero-Python plan; the oracle runs the identical Mercator
    formula (fgcspark/cells/quadkey.py quadkey_sql), so parity is
    exact up to the documented boundary-ulp of libm tan/cos/ln."""
    from fgcspark.cells.quadkey import quadkey
    from fgcspark.extract import with_extracted
    from fgcspark.pipeline import load_pages

    df = with_extracted(load_pages(spark, _geo_dir(sf_dir)))
    return df.where(F.col("lon").isNotNull() & F.col("lat").isNotNull()).select(
        "url", quadkey(F.col("lon"), F.col("lat"), 12).alias("qk12")
    )


def _q_quadkey_rollup(spark, sf_dir):
    """Tile counts at z=10 derived from the z=12 key by PREFIX SLICE —
    the quadkey hierarchy makes parent rollup a substring, not a
    re-projection, so a 100 TB multi-zoom pyramid is one scan plus
    arithmetic. The oracle substrings the same z=12 formula."""
    from fgcspark.cells.quadkey import parent_key, quadkey
    from fgcspark.extract import with_extracted
    from fgcspark.pipeline import load_pages

    df = with_extracted(load_pages(spark, _geo_dir(sf_dir)))
    q12 = quadkey(F.col("lon"), F.col("lat"), 12)
    return (
        df.where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .groupBy(parent_key(q12, 12, 2).alias("qk10"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_hex_cells(spark, sf_dir):
    """Planar H3-style hex index (pointy-top, 5 km circumradius) over
    the TM35FIN plane — the hexagonal half of the north_star's 'H3/S2
    cells'. Pure Catalyst arithmetic; same formula re-derived in the
    DuckDB oracle via hexgrid.hex_id_sql."""
    from fgcspark.cells.hexgrid import hex_id
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    return pts.select("url", hex_id(F.col("e"), F.col("n"), 5000.0).alias("hex_id"))


def _q_hex_cell_counts(spark, sf_dir):
    return (
        _q_hex_cells(spark, sf_dir)
        .groupBy("hex_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_hex_ring_counts(spark, sf_dir):
    """Hex gridDisk(k=2) aggregation over the 20 hottest 5 km hexes —
    19-cell neighborhood sums via literal-offset explode + broadcast
    join (the base aggregate is computed once, never rescanned)."""
    from fgcspark.cells.hexgrid import hex_ring_counts

    # eager localCheckpoint: `hot` and the join side share this
    # aggregate — ONE extract-pipeline scan, and unlike persist() the
    # downstream jobs read materialized partitions with no cache-write
    # overhead (the cell_distinctive_terms/hotspots shape; measured
    # 1.4-1.6 s vs 2.1-2.4 s persist, 1.9-6.5 s uncached at sf0.1)
    counts = _q_hex_cell_counts(spark, sf_dir).localCheckpoint()
    hot = counts.orderBy(F.desc("n_docs"), F.asc("hex_id")).limit(20)
    return hex_ring_counts(hot, counts, k=2)


def _q_chunked_resume(spark, sf_dir):
    """Kill-and-resume lineage path (north_rule): run 3 of 8 chunks,
    then resume in a fresh runner; the resumed output must equal the
    straight-through pipeline (oracle = generator truth)."""
    from fgcspark.checkpoint import ChunkedRunner
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)

    def build(s):
        return pages_to_points(s, d).select("url", "cell_10km")

    out = f"{d}/_resume_out"
    ChunkedRunner(spark, out, n_chunks=8).run(build, max_chunks=3)  # "killed"
    runner = ChunkedRunner(spark, out, n_chunks=8)  # fresh driver resumes
    runner.run(build)
    return runner.read_output()


def _q_knn(spark, sf_dir):
    from fgcspark.joins.knn import knn_join
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    probes = spark.read.parquet(f"{d}/probes.parquet")
    return knn_join(spark, pts, probes, k=5).select("probe_id", "url")


def _q_knn_partitioned(spark, sf_dir):
    """Distributed twin of knn_k5: unbounded probe side, frontier ring
    expansion, no probe collect/broadcast; same brute-force golden."""
    from fgcspark.joins.knn import knn_join_partitioned
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    probes = spark.read.parquet(f"{d}/probes.parquet")
    return knn_join_partitioned(spark, pts, probes, k=5).select("probe_id", "url")


def _q_dwithin(spark, sf_dir):
    """Distance-within join: pages within 25 km (EPSG:3067 plane) of
    each probe, via broadcast cell cover + exact squared-distance test
    (zero page-side shuffle)."""
    from fgcspark.joins.dwithin import dwithin_join
    from fgcspark.pipeline import pages_to_points
    from fgcspark.synth.pages import DW_RADIUS_M

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    probes = spark.read.parquet(f"{d}/probes.parquet")
    return dwithin_join(spark, pts, probes, radius_m=DW_RADIUS_M)


def _q_dwithin_partitioned(spark, sf_dir):
    """Distributed twin: unbounded probe side, offset-superset cover +
    exact filter; same brute-force golden."""
    from fgcspark.joins.dwithin import dwithin_join_partitioned
    from fgcspark.pipeline import pages_to_points
    from fgcspark.synth.pages import DW_RADIUS_M

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    probes = spark.read.parquet(f"{d}/probes.parquet")
    return dwithin_join_partitioned(spark, pts, probes, radius_m=DW_RADIUS_M)


def _q_iceberg_merge(spark, sf_dir):
    """Copy-on-write MERGE upsert on the Iceberg-lite layout: documents
    keyed by doc_id, one update batch that rewrites a tenth of the keys
    (lang -> 'xx') and inserts shifted new keys. Rebuilt from scratch
    each run (deterministic); oracle re-derives the upsert with an
    anti-join union."""
    import shutil

    from fgcspark.io.iceberg_lite import IcebergLiteTable

    d = _geo_dir(sf_dir)
    root = f"{d}/_icb_merge"
    shutil.rmtree(root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    t = IcebergLiteTable(root)
    t.append(docs.repartitionByRange(4, "doc_id"), stat_cols=["doc_id"])
    ups = docs.where(F.col("doc_id") % 10 == 0).withColumn(
        "lang", F.lit("xx")
    ).unionByName(
        docs.where(F.col("doc_id") % 97 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )
    t.merge_upsert(spark, ups, "doc_id")
    return t.read(spark)


def _q_streamed_points(spark, sf_dir):
    """Structured Streaming ingest (file source, AvailableNow): drains
    the pages dir as micro-batches through the same extract/geometry
    pipeline; exactly-once via the stream checkpoint. Output must equal
    the batch truth."""
    from fgcspark.streaming.ingest import ingest_points

    d = _geo_dir(sf_dir)
    out, ck = f"{d}/_stream_out", f"{d}/_stream_ck"
    ingest_points(spark, d, out, ck, glob="pages.parquet")
    return spark.read.parquet(out).select("url", "cell_10km")


def _q_streamed_sessions(spark, sf_dir):
    """Streaming gap sessionization (session_window + watermark,
    AvailableNow drain): per-user session start/end/count, flushed by
    a far-future close-the-books heartbeat whose own session is
    dropped. Oracle re-derives the strict-boundary (diff >= gap)
    session semantics with window SQL."""
    import pathlib
    import shutil

    import pandas as pd

    from fgcspark.streaming.sessions import streaming_session_stats

    d = _geo_dir(sf_dir)
    stage, out, ck = f"{d}/_sess_in", f"{d}/_sess_out", f"{d}/_sess_ck"
    pathlib.Path(stage).mkdir(parents=True, exist_ok=True)
    dst = pathlib.Path(stage) / "events.parquet"
    if not dst.exists():
        shutil.copy(f"{sf_dir}/events.parquet", dst)
    hb_path = pathlib.Path(stage) / "zz-heartbeat.parquet"
    if not hb_path.exists():
        hb = pd.DataFrame(
            {
                "event_id": pd.array([10**12], dtype="int64"),
                "ts": pd.array([pd.Timestamp("2100-01-01")]).astype("datetime64[us]"),
                "user_id": pd.array([-1], dtype="int64"),
                "event_type": ["heartbeat"],
                "value": [0.0],
                "props": [""],
            }
        )
        hb.to_parquet(hb_path, index=False)
    streaming_session_stats(spark, stage, out, ck, gap="30 minutes")
    return spark.read.parquet(out).where(F.col("user_id") >= 0)


def _q_streamed_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the
    md5_56 content fingerprint, AvailableNow drain): the staged input
    is the pages corpus PLUS a re-crawled copy of every 20th page
    (new url, +1 h warc_ts, same content) — the copies must emit NO
    rows, so the drained output is exactly one fingerprint per
    distinct original text. Oracle = DISTINCT fingerprints of the
    original corpus (duplicates add none)."""
    import pathlib
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from fgcspark.streaming.dedup import streaming_exact_dedup

    d = _geo_dir(sf_dir)
    stage, out, ck = f"{d}/_dedup_in", f"{d}/_dedup_out", f"{d}/_dedup_ck"
    pathlib.Path(stage).mkdir(parents=True, exist_ok=True)
    dst = pathlib.Path(stage) / "aa-pages.parquet"
    if not dst.exists():
        shutil.copy(f"{d}/pages.parquet", dst)
    re_path = pathlib.Path(stage) / "zz-recrawl.parquet"
    if not re_path.exists():
        t = pq.read_table(f"{d}/pages.parquet")
        sel = t.take(list(range(0, t.num_rows, 20)))
        urls2 = pa.array(
            [
                "https://recrawl.example/" + u.rsplit("/", 1)[-1]
                for u in sel["url"].to_pylist()
            ],
            sel.schema.field("url").type,
        )
        ts2 = pc.add(
            sel["warc_ts"], pa.scalar(3_600_000_000, pa.duration("us"))
        ).cast(sel.schema.field("warc_ts").type)
        arrays = [
            urls2 if name == "url" else ts2 if name == "warc_ts" else sel[name]
            for name in sel.schema.names
        ]
        # keep the EXACT original schema so the stream's fixed reader
        # schema matches byte-for-byte
        pq.write_table(pa.Table.from_arrays(arrays, schema=sel.schema), re_path)
    streaming_exact_dedup(spark, stage, out, ck, horizon="30 days")
    return spark.read.parquet(out).select("fp")


def _q_streamed_decontaminate(spark, sf_dir):
    """Streaming decontamination (stream-static broadcast shingle join
    + watermarked per-(day-window, doc) hit counts, AvailableNow
    drain): documents with doc_id % 97 == 0 play the static eval
    benchmark; the rest stream in with ts = 2021-06-08 + doc_id*37 s.
    A far-future heartbeat (sentinel shingle, id dropped from the
    output) seals every real window — see the module docstring for why
    the heartbeat must itself produce a shingle."""
    import pathlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fgcspark.streaming.decontaminate import streaming_decontaminate

    d = _geo_dir(sf_dir)
    stage, out, ck = f"{d}/_decon_in", f"{d}/_decon_out", f"{d}/_decon_ck"
    pathlib.Path(stage).mkdir(parents=True, exist_ok=True)
    dst = pathlib.Path(stage) / "aa-docs.parquet"
    if not dst.exists():
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        df = t.to_pandas()
        df = df[df["doc_id"] % 97 != 0]
        df["ts"] = (
            pd.Timestamp("2021-06-08")
            + pd.to_timedelta(df["doc_id"] * 37, unit="s")
        ).astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(df[["doc_id", "ts", "text"]], preserve_index=False),
            dst,
        )
    hb_path = pathlib.Path(stage) / "zz-heartbeat.parquet"
    if not hb_path.exists():
        hb = pd.DataFrame(
            {
                "doc_id": pd.array([10**12], dtype="int64"),
                "ts": pd.array([pd.Timestamp("2100-01-01")]).astype("datetime64[us]"),
                "text": ["\x01hb \x01hb \x01hb"],
            }
        )
        pq.write_table(pa.Table.from_pandas(hb, preserve_index=False), hb_path)
    eval_docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 97 == 0)
    streaming_decontaminate(spark, stage, eval_docs, out, ck, n=3)
    return (
        spark.read.parquet(out)
        .where(F.col("doc_id") != 10**12)
        .select("window_start", "doc_id", "n_hits")
    )


def _q_raster_tiles(spark, sf_dir):
    """Raster<->vector tile aggregation (north_rule): per 100 km cell,
    the dense 10x10 raster of 10 km sub-cell counts, emitted in long
    form (cell, sub_idx in 0..99, n_docs) — sub_idx = row-major index
    of the 10 km cell inside its 100 km parent. Pure arithmetic."""
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    sub = (
        F.pmod(F.floor(F.col("n") / 10000), F.lit(10)) * 10
        + F.pmod(F.floor(F.col("e") / 10000), F.lit(10))
    ).cast("int")
    return (
        pts.groupBy(F.col("cell_100km").alias("cell"), sub.alias("sub_idx"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_raster_dense(spark, sf_dir):
    """vector -> raster: per 100 km cell the dense 10x10 array of 10 km
    sub-cell counts (tiles.raster_assemble), emitted CSV-joined so the
    oracle compare is a plain string column."""
    from fgcspark.pipeline import pages_to_points
    from fgcspark.tiles import raster_assemble

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    r = raster_assemble(pts.select("cell_100km", "e", "n"))
    return r.select("cell", F.array_join("raster", ",").alias("raster_csv"))


def _q_raster_roundtrip(spark, sf_dir):
    """raster -> vector inverse: exploding the dense rasters back must
    reproduce the sparse long form exactly (same oracle as
    raster_tiles_100km)."""
    from fgcspark.pipeline import pages_to_points
    from fgcspark.tiles import raster_assemble, raster_to_vector

    pts = pages_to_points(spark, _geo_dir(sf_dir))
    return raster_to_vector(raster_assemble(pts.select("cell_100km", "e", "n")))


def _q_chunk_window(spark, sf_dir):
    """Reference n/skip chunk window (S1, api.R:144-162) as a query:
    rows 100..149 of the pages table in url order. Numbered with the
    two-pass range-partitioned global row number (fgcspark.windows) —
    never a single-task `Window.orderBy`."""
    from fgcspark.pipeline import load_pages
    from fgcspark.windows import chunk_window

    return chunk_window(
        load_pages(spark, _geo_dir(sf_dir)).select("url", "lang"),
        "url",
        skip=100,
        n=50,
    )


def _q_occ_facts_join(spark, sf_dir):
    """Citable-archive facts path (S1/S2/J1) with the reference's
    Finnish fact whitelist (R/finbif_geo_convert.R:641-653): pivot the
    long facts table, broadcast-join onto occurrence rows, sanitise
    column names (P2)."""
    from fgcspark.errors import sanitise_nms
    from fgcspark.facts import join_facts
    from fgcspark.synth.occ import WHITELIST, generate_occ

    d = generate_occ(Path(_geo_dir(sf_dir)).name)
    rows = spark.read.parquet(f"{d}/occ_rows.parquet")
    facts = spark.read.parquet(f"{d}/occ_facts.parquet")
    out = join_facts(rows, facts, WHITELIST, "occurrenceID", order_col="ord")
    out = out.toDF(*sanitise_nms(out.columns))
    # null-free projection so the driver's order-insensitive row sort is
    # well-defined (absent fact -> '', absent count -> -1)
    exprs = []
    for c, t in out.dtypes:
        if t == "string":
            exprs.append(F.coalesce(F.col(c), F.lit("")).alias(c))
        else:
            exprs.append(F.coalesce(F.col(c), F.lit(-1)).alias(c))
    return out.select(*exprs)


_ARCHIVE_COLS = [
    "occurrenceID", "eventID", "datasetID", "scientificName",
    "organismQuantity", "eventDate", "municipality",
    "decimalLatitude", "decimalLongitude", "footprintWKT", "UnitNotes",
    "Havainnon_laatu", "Havainnon_määrän_yksikkö",
    "Museo_johon_lajista_kerätty_näyte_on_talletettu",
    "Vesistöalue", "Sijainnin_tarkkuusluokka", "Pesintätulos",
    "Seurattava_laji",
]


def _q_occ_archive_load(spark, sf_dir):
    """S1 over the reference's REAL input shape: a citable-download zip
    (rows TSV + 3 fact TSVs + readme, inst/tinytest/HBF.53254.zip
    layout) routed by member name, fact-pivoted per level, columns
    deselected and Darwin Core-renamed (R/finbif_geo_convert.R:78-126).
    The DuckDB oracle parses the EXTRACTED TSVs with its own reader —
    the two engines share only bytes on disk."""
    from fgcspark.io.archive import read_citable_zip
    from fgcspark.synth.archive import HBF_ID, generate_archive

    d = generate_archive(Path(_geo_dir(sf_dir)).name)
    rows, _readme = read_citable_zip(spark, f"{d}/HBF.{HBF_ID}.zip")
    return rows.select(
        *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in _ARCHIVE_COLS]
    )


# ---------------------------------------------------------------------------
# relational / training-data queries (driver testdata views)
# ---------------------------------------------------------------------------


def _t(spark, sf_dir, name):
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Parquet scans split at row-group boundaries, and the small-SF
    # test files were written as 1-3 row groups — so no
    # maxPartitionBytes setting can feed more than 3 of the 32 local
    # cores. Fan the scan out once up front when the source is
    # under-split relative to the session (local-bench ergonomics; on
    # a cluster a 100 TB table has orders more row groups than cores
    # and this branch never fires). An explicit repartition(N) is
    # honoured by AQE (user-specified), so it won't be coalesced away.
    # the probe itself costs a DataFrame->RDD plan conversion, so it is
    # gated to local masters — a cluster session never pays it
    if spark.sparkContext.master.startswith("local"):
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def _q_occ_facts_typed(spark, sf_dir):
    """Typed facts pivot (SURVEY §1.2): surface each whitelisted fact
    from its natural typed column (string / int64 / double) instead of
    the string Value the reference consumes."""
    from fgcspark.facts import pivot_facts_typed
    from fgcspark.synth.occ import generate_occ

    d = generate_occ(Path(_geo_dir(sf_dir)).name)
    facts = spark.read.parquet(f"{d}/occ_facts.parquet")
    out = pivot_facts_typed(
        facts,
        {
            "Havainnon laatu": "Value",
            "Sijainnin tarkkuusluokka": "IntValue",
            "Vesistoalue": "DecimalValue",
        },
        order_col="ord",
    )
    return out.select(
        F.col("Parent").alias("occurrenceID"),
        F.coalesce(F.col("`Havainnon laatu`"), F.lit("")).alias("laatu"),
        F.coalesce(F.col("`Sijainnin tarkkuusluokka`"), F.lit(-1)).alias("tarkkuus"),
        F.coalesce(F.col("`Vesistoalue`"), F.lit(-1.0)).alias("vesisto"),
    )


def _q_facts_pivot(spark, sf_dir):
    from fgcspark.facts import pivot_facts

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("Parent"),
        F.col("event_type").alias("Fact"),
        F.col("value").alias("Value"),
        F.col("event_id").alias("ord"),
    )
    wl = ["click", "view", "purchase", "signup", "error"]
    return pivot_facts(ev, wl, order_col="ord").withColumnRenamed("Parent", "user_id")


def _q_exact_dedup(spark, sf_dir):
    from fgcspark.textops import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def _q_ngram_jaccard(spark, sf_dir):
    from fgcspark.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, tau_pct=6)


def _q_minhash(spark, sf_dir):
    from fgcspark.textops import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=3, tau_pct=6)


def _q_embed_neardup_ivf(spark, sf_dir):
    """Sub-quadratic IVF-bucketed near-dup (the 100 TB path next to
    the exact block-cogroup baseline): centroid assignment is a
    deterministic spec the DuckDB oracle mirrors exactly."""
    from fgcspark.sim import embedding_neardup_pairs_ivf

    return embedding_neardup_pairs_ivf(_t(spark, sf_dir, "embeddings"), tau=0.4)


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components -> one keeper per
    cluster (fgcspark.cc): the step after pair mining in a real
    training-data dedup. Oracle: DuckDB recursive CTE transitive
    closure over the same (independently recomputed) pair set."""
    from fgcspark.cc import dedup_clusters
    from fgcspark.textops import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, n=3, tau_pct=6)
    return dedup_clusters(docs, pairs)


def _q_simhash(spark, sf_dir):
    from fgcspark.textops import simhash_pairs

    return simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


def _q_langid(spark, sf_dir):
    from fgcspark.textops import langid

    return langid(_t(spark, sf_dir, "documents"))


def _q_quality(spark, sf_dir):
    from fgcspark.textops import quality

    return quality(_t(spark, sf_dir, "documents"))


def _q_tokens(spark, sf_dir):
    from fgcspark.textops import token_count

    return token_count(_t(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from fgcspark.textops import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _q_hash_sample(spark, sf_dir):
    """Deterministic Bernoulli(0.25) sample by 56-bit md5 of doc_id —
    partition-layout- and engine-independent (same rows in DuckDB)."""
    from fgcspark.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.25, "doc_id").select("doc_id", "lang")


def _q_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by disjoint
    hash ranges of doc_id."""
    from fgcspark.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs, _SPLIT_WEIGHTS, "doc_id").select("doc_id", "split")


def _q_quota_sample(spark, sf_dir):
    """Stratified quota: the 20 smallest-hash docs per language —
    exact per-stratum uniform sample, WindowGroupLimit plan."""
    from fgcspark.sampling import quota_sample

    docs = _t(spark, sf_dir, "documents")
    return quota_sample(docs, "lang", 20, "doc_id").select("doc_id", "lang")


def _q_canonical_urls(spark, sf_dir):
    """URL canonicalization over an adversarial corpus derived from
    doc_id (mixed-case scheme/host, default + explicit ports, empty
    paths, tracking params, fragments) — both engines construct the
    SAME url string, then canonicalize with their own twin."""
    from fgcspark.urlops import canonical_url

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(F.lit("http://")),
        F.lit("Site"),
        (d % 7).cast("string"),
        F.lit(".Example"),
        F.when(d % 3 == 0, F.when(d % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/P/"), d.cast("string"))
        ),
        F.when(d % 2 == 0, F.lit("?utm_source=x&b=2&a=1#frag")).otherwise(
            F.lit("?z=9&utm_campaign=c&a=1&gclid=g")
        ),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return docs.select("doc_id", canonical_url(url).alias("canon"))


def _q_latest_crawl(spark, sf_dir):
    """Cross-snapshot recrawl dedup: adversarial urls built from doc_id
    so that case/port/tracking-param variants COLLIDE heavily on the
    canonical key — everything is determined by d mod 60 (host d%3,
    path d%5, query-class d%4, port d%3xd%2), so 500 docs collapse to
    <= 60 canonicals (~8 snapshots each); newest deterministic crawl_ts
    wins, url breaks ties. Both engines construct identical columns."""
    from fgcspark.urlops import latest_crawl

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(F.lit("http://")),
        F.lit("Site"),
        (d % 3).cast("string"),
        F.lit(".Example"),
        F.when(d % 3 == 0, F.when(d % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.concat(F.lit("/p/"), (d % 5).cast("string")),
        F.when(d % 4 == 0, F.lit("?utm_source=x&b=2&a=1#frag"))
        .when(d % 4 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit("")),
    )
    pages = _t(spark, sf_dir, "documents").select(
        url.alias("url"), (d * 37 % 100000).cast("long").alias("crawl_ts")
    )
    return latest_crawl(pages, ts_col="crawl_ts")


def _q_incremental_dedup(spark, sf_dir):
    """New-batch-vs-corpus dedup: docs with doc_id % 5 == 0 play the
    existing corpus; the fresh batch is the remaining docs PLUS a
    re-crawled copy of every corpus doc (new id, same content) — the
    gate proves the copies are dropped and the fresh rows survive
    (sf0.01 texts are all distinct, so without the injected copies the
    anti join would be exercised on an empty overlap)."""
    from fgcspark.textops import incremental_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 5 == 0)
    recrawl = corpus.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    batch = docs.where(F.col("doc_id") % 5 != 0).unionByName(recrawl)
    return incremental_dedup(batch, corpus).select("doc_id")


def _q_line_dedup(spark, sf_dir):
    """C4-style boilerplate line removal. Both engines prepend the SAME
    deterministic boilerplate blocks (a 10-word cookie banner on every
    doc + a 10-word newsletter plug on even doc_ids — both far above
    the max_docs=2 threshold within every lang) so the gate proves the
    repeated lines are stripped and each doc's unique tail survives in
    order."""
    from fgcspark.textops import line_dedup

    d = F.col("doc_id")
    boiler = F.concat(
        F.lit("cookie notice accept all terms of service privacy policy please "),
        F.when(
            d % 2 == 0,
            F.lit("subscribe to our newsletter for updates and special offers today "),
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", boiler.alias("text")
    )
    return line_dedup(docs, max_docs=2)


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per-corpus-doc count of word trigrams
    shared with a held-out eval set (docs with doc_id % 97 == 0 play
    the benchmark; the rest are the corpus). Broadcast semi-join on the
    DISTINCT eval shingle set — the corpus never shuffles by shingle."""
    from fgcspark.textops import decontaminate

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return decontaminate(corpus, eval_docs, n=3)


def _q_pii_scrub(spark, sf_dir):
    """PII detect + mask. Both engines append the SAME deterministic
    PII strings (emails on doc_id%7, IPv4 on %11, E.164 phones on %13)
    so the gate proves counts and placeholder rewrites on text where
    PII provably occurs; pure regexp codegen, zero shuffles."""
    from fgcspark.pii import pii_scrub

    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" contact u"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0,
            F.concat(F.lit(" from 10.0."), (d % 256).cast("string"), F.lit(".1")),
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0,
            F.concat(
                F.lit(" call +35855"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        ).otherwise(F.lit("")),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", injected.alias("text"))
    return pii_scrub(docs)


def _q_duplicate_spans(spark, sf_dir):
    """Lee-et-al-style exact substring dedup: maximal duplicated token
    spans (>= 8 tokens, verbatim, anywhere in the corpus). The synth
    corpus's small vocabulary produces ~1k naturally duplicated 8-grams
    at sf0.01, so the gate exercises real anchor merging."""
    from fgcspark.textops import duplicate_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicate_spans(docs, k=8)


def _q_unigram_logprob(spark, sf_dir):
    """CCNet-style quality score: mean token log-prob under a unigram
    LM trained on the corpus itself. Rounded to 6 decimals in both
    engines so summation order cannot flip the hash."""
    from fgcspark.textops import unigram_logprob

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_logprob(docs)


def _q_remove_dup_spans(spark, sf_dir):
    """The substring-dedup transformation: docs rebuilt with every
    duplicated >= 8-token span cut out, order preserved; fully-
    duplicated docs come back as empty strings, untouched docs pass
    through byte-identical."""
    from fgcspark.textops import remove_duplicate_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(docs, k=8)


def _q_pip_anti(spark, sf_dir):
    """Pages whose point lands in NO polygon of the layer (out-of-layer
    geotag QA) — complement of pip_join, one aggregate, no anti join of
    two full tables."""
    from fgcspark.joins.pip import pip_anti_join
    from fgcspark.pipeline import pages_to_points

    d = _geo_dir(sf_dir)
    pts = pages_to_points(spark, d).select("url", "e", "n")
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    return pip_anti_join(spark, pts, polys)


def _q_top_tokens(spark, sf_dir):
    """Per-language top-20 token vocabulary (deterministic ranking,
    WindowGroupLimit over the aggregated table)."""
    from fgcspark.textops import top_tokens_per_group

    return top_tokens_per_group(_t(spark, sf_dir, "documents"), k=20)


def _q_repetition(spark, sf_dir):
    """Gopher-style repetition filters: duplicated word 2-/3-gram
    fractions per doc, all inside codegen (no explode, no Python)."""
    from fgcspark.textops import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


def _q_oov_rate(spark, sf_dir):
    """Vocabulary OOV-rate quality score (model-free perplexity
    stand-in): fraction of each doc's tokens outside the corpus
    top-1000 vocabulary. Counts + one exact division, so the floats
    hash-compare across engines."""
    from fgcspark.textops import oov_rate

    return oov_rate(_t(spark, sf_dir, "documents"), vocab_size=1000)


def _q_pack_sequences(spark, sf_dir):
    """Greedy sequence packing into 4096-token bins per
    (lang, md5-hash-bucket shard) stream — the training-batch
    construction step with bounded per-task state. Oracle: recursive
    CTE partitioned by the same (lang, shard) over the same shared
    token-count expression."""
    from fgcspark.textops import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=4096)


def _q_balanced_sample(spark, sf_dir):
    """Mixture rebalancing: deterministic per-language hash rates
    flatten the language distribution toward the smallest group."""
    from fgcspark.sampling import balanced_sample

    docs = _t(spark, sf_dir, "documents")
    return balanced_sample(docs, "lang", "doc_id").select("doc_id", "lang")


def _q_training_shuffle(spark, sf_dir):
    """Deterministic global training-order permutation of the corpus:
    rank by (md5_56(doc_id), doc_id) via the scalable 2-pass range
    numbering — same permutation in any engine or layout."""
    from fgcspark.sampling import shuffle_rank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_rank(docs, "doc_id").select("doc_id", "rank")


def _q_embed_neardup(spark, sf_dir):
    from fgcspark.sim import embedding_neardup_pairs_vec

    return embedding_neardup_pairs_vec(_t(spark, sf_dir, "embeddings"), tau=0.4)


def _q_ann_topk(spark, sf_dir):
    from fgcspark.sim import ann_topk_brute

    return ann_topk_brute(_t(spark, sf_dir, "embeddings"), n_queries=5, k=10)


def _q_ann_ivf(spark, sf_dir):
    from fgcspark.sim import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), n_queries=5, k=10, centroid_mod=50, nprobe=2)


def _q_iceberg_pruned(spark, sf_dir):
    """Iceberg-layout table scan (input_hint: "Iceberg table of pages"):
    append pages into the snapshot/manifest layout (idempotent), then a
    url-range query resolved through manifest min/max file pruning plus
    the exact predicate — lang counts over the pruned range."""
    from fgcspark.io.iceberg_lite import IcebergLiteTable

    d = _geo_dir(sf_dir)
    t = IcebergLiteTable(f"{d}/_iceberg_tbl")
    if t.current_snapshot_id() is None:
        pages = spark.read.parquet(f"{d}/pages.parquet")
        t.append(pages.repartitionByRange(8, "url"), stat_cols=["url"])
    lo, hi = "https://site2", "https://site5"
    return (
        t.read(spark, pruning={"url": (lo, hi)})
        .where(F.col("url").between(lo, hi))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


_MEDIA_SENTINELS = {"fmt": "", "width": -1, "height": -1, "channels": -1}


def _desentinel(df):
    """NULL header fields -> sentinels ('' / -1): the driver's compare
    sorts raw value tuples, and Python cannot order None against int —
    mirrored with identical coalesces in the oracles."""
    for c, v in _MEDIA_SENTINELS.items():
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return df


def _load_media(spark, sf_dir):
    """The blob table (url, media) — separate from pages so relational
    scans never pay blob split overhead (see synth.pages)."""
    return spark.read.parquet(f"{_geo_dir(sf_dir)}/media.parquet")


def _q_media_meta(spark, sf_dir):
    from fgcspark.multimodal import media_metadata

    return _desentinel(media_metadata(_load_media(spark, sf_dir)))


def _q_media_decode(spark, sf_dir):
    from fgcspark.multimodal import decode_image_stub

    return _desentinel(
        decode_image_stub(_load_media(spark, sf_dir)).select(
            "url", "fmt", "width", "height", "channels"
        )
    )


def _q_media_resize(spark, sf_dir):
    from fgcspark.multimodal import decode_image_stub, resize_stub

    out = resize_stub(
        decode_image_stub(_load_media(spark, sf_dir)), max_side=256
    ).select("url", "out_width", "out_height")
    return out.select(
        "url",
        F.coalesce("out_width", F.lit(-1)).alias("out_width"),
        F.coalesce("out_height", F.lit(-1)).alias("out_height"),
    )


def _q_media_frames(spark, sf_dir):
    from fgcspark.multimodal import sample_frames_stub

    return sample_frames_stub(_load_media(spark, sf_dir))


def _q_lineitem_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _q_revenue_by_nation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nn = _t(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000).cast(
        "long"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nn), c.c_nationkey == nn.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_e4"), F.count(F.lit(1)).alias("n_items"))
    )


def _q_latest_event(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def _q_events_asof(spark, sf_dir):
    """As-of join: for each purchase event, the same user's most recent
    click at or before it (union + tag + window — one shuffle on
    user_id, no theta-join blow-up)."""
    from fgcspark.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(purchases, clicks, "user_id", "ts", "event_id", ["value"])
    # sentinel-coalesce the nullable as-of payload: the driver's compare
    # sorts raw row tuples, which a None cannot participate in (same
    # convention as occ_facts_join)
    return out.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("asof_event_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("asof_value"), F.lit(-1.0)).alias("click_value"),
    )


def _q_token_percentiles(spark, sf_dir):
    """Corpus QA: per-language p50/p90/p99 of BPE-ish token counts
    (exact percentile; approx_count sketch variant is the 100 TB path)."""
    from fgcspark.textops import token_percentiles

    return token_percentiles(_t(spark, sf_dir, "documents"))


def _q_event_sessions(spark, sf_dir):
    """Gap-based sessionization of the event stream (30-min gap):
    per-session event count and duration. One shuffle on user_id;
    micros-exact boundary decisions."""
    from fgcspark.windows import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, gap_s=1800)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (
                F.max(F.unix_micros(F.col("ts").cast("timestamp")))
                - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
            )
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
        F.min("event_id").alias("first_event"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Contract queries, ordered for the driver's 50-query correctness cap.

    The external gate checks at most the first 50 entries, so ordering IS
    coverage.  Rotation policy (one slot-window per round):

    * round 4: the 29 training-data ops with no r3 driver row first, then
      everything whose engine code changed since the r3 gate.
    * round 5 (this file): the trailing block that got no r4 driver row —
      led by the five queries that have NEVER had one
      (species_cooccurrence, getis_ord_gi10, morans_i_10km,
      layer_area_perimeter, layer_hulls) — plus the new streamed_dedup
      and every query whose r5 code changed behavior (hash-keyed
      exact/incremental dedup, the four media ops over the new real
      header blobs, the localCheckpoint ring counts).

    Everything past slot 50 is still verified each round by the local gate
    (``scripts/check_contract.py`` runs ALL entries through the same
    DuckDB-oracle diff).  With 104 queries and a 50-row cap, 13 of the 54
    past-window entries deserve a note: ten are r3-driver-green,
    code-unchanged twins whose kernel is exercised by an in-window sibling
    (facts_pivot / pip_counts / knn_k5_partitioned /
    dwithin_join_partitioned / tile_counts_10km_salted /
    s2_cell_counts_l10 / geohash_counts_p5 / hex_cell_counts /
    raster_roundtrip_100km / lineitem_agg), and three (dbscan_cells,
    host_linkgraph, host_pagerank) are r4-driver-green with unchanged
    engine code whose ORACLES were made scale-robust in r5 — the local
    gate re-validated the new oracles against the unchanged engine
    output.
    """
    return {
        # --- slots 1-5: never driver-checked (late-r4 additions) ---
        "species_cooccurrence": _q_species_cooccurrence,
        "getis_ord_gi10": _q_getis_ord,
        "morans_i_10km": _q_morans_i,
        "layer_area_perimeter": _q_layer_stats,
        "layer_hulls": _q_layer_hulls,
        # --- slots 6-14: new in r5, or r5 behavior-changing code ---
        "streamed_dedup": _q_streamed_dedup,
        "streamed_decontaminate": _q_streamed_decontaminate,
        "exact_dedup": _q_exact_dedup,
        "incremental_dedup": _q_incremental_dedup,
        "media_metadata": _q_media_meta,
        "media_decode_stub": _q_media_decode,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        "hex_ring_counts": _q_hex_ring_counts,
        "cell_ring_counts": _q_cell_ring_counts,
        # --- slots 15-50: the r4 trailing block (no r4 driver row) ---
        "occ_archive_load": _q_occ_archive_load,
        "occ_facts_join": _q_occ_facts_join,
        "chunked_resume": _q_chunked_resume,
        "chunk_window": _q_chunk_window,
        "pages_extract_text": _q_extract,
        "pages_points_wkt": _q_points,
        "pages_bbox_wkt": _q_bbox,
        "pages_footprint_types": _q_footprint_types,
        "pages_tiles": _q_tiles,
        "tile_counts_10km": _q_tile_counts,
        "tile_rollup": _q_tile_rollup,
        "pages_cells_jvm": _q_pages_cells_jvm,
        "pages_zorder": _q_zorder,
        "bbox_range_join": _q_bbox_range_join,
        "s2_cells_l12": _q_s2_cells,
        "geohash_p6": _q_geohash,
        "hex_cells_5km": _q_hex_cells,
        "raster_tiles_100km": _q_raster_tiles,
        "raster_dense_100km": _q_raster_dense,
        "top_hosts_per_cell": _q_top_hosts_per_cell,
        "lang_cell_rollup": _q_lang_cell_rollup,
        "host_stats": _q_host_stats,
        "pip_join": _q_pip,
        "pip_join_partitioned": _q_pip_partitioned,
        "fp_layer_join": _q_fp_join,
        "fp_layer_join_partitioned": _q_fp_join_partitioned,
        "knn_k5": _q_knn,
        "dwithin_join": _q_dwithin,
        "streamed_points": _q_streamed_points,
        "streamed_sessions": _q_streamed_sessions,
        "iceberg_merge_upsert": _q_iceberg_merge,
        "latest_event_per_user": _q_latest_event,
        "events_asof_join": _q_events_asof,
        "event_sessions": _q_event_sessions,
        "revenue_by_nation": _q_revenue_by_nation,
        # --- slots 51+: locally gated each round; r3- or r4-driver-green
        # with unchanged engine code (see docstring for the 12 notes) ---
        "facts_pivot": _q_facts_pivot,
        "pip_counts": _q_pip_counts,
        "knn_k5_partitioned": _q_knn_partitioned,
        "dwithin_join_partitioned": _q_dwithin_partitioned,
        "tile_counts_10km_salted": _q_tile_counts_salted,
        "s2_cell_counts_l10": _q_s2_cell_counts,
        "geohash_counts_p5": _q_geohash_counts,
        "hex_cell_counts": _q_hex_cell_counts,
        "raster_roundtrip_100km": _q_raster_roundtrip,
        "lineitem_agg": _q_lineitem_agg,
        "dbscan_cells": _q_dbscan_cells,
        "host_linkgraph": _q_host_linkgraph,
        "host_pagerank": _q_host_pagerank,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "minhash_lsh_pairs": _q_minhash,
        "dedup_clusters": _q_dedup_clusters,
        "simhash_pairs": _q_simhash,
        "langid": _q_langid,
        "quality_signals": _q_quality,
        "token_counts": _q_tokens,
        "token_percentiles": _q_token_percentiles,
        "doc_fingerprint": _q_fingerprint,
        "hash_sample_25pct": _q_hash_sample,
        "hash_split_801010": _q_hash_split,
        "quota_sample_lang": _q_quota_sample,
        "balanced_sample_lang": _q_balanced_sample,
        "training_shuffle": _q_training_shuffle,
        "canonical_urls": _q_canonical_urls,
        "pack_sequences": _q_pack_sequences,
        "oov_rate": _q_oov_rate,
        "repetition_signals": _q_repetition,
        "top_tokens_per_lang": _q_top_tokens,
        "embed_neardup": _q_embed_neardup,
        "iceberg_pruned_scan": _q_iceberg_pruned,
        "ann_topk_brute": _q_ann_topk,
        "ann_topk_ivf": _q_ann_ivf,
        "embed_neardup_ivf": _q_embed_neardup_ivf,
        "pip_anti_join": _q_pip_anti,
        "latest_crawl_dedup": _q_latest_crawl,
        "line_dedup": _q_line_dedup,
        "decontaminate": _q_decontaminate,
        "pii_scrub": _q_pii_scrub,
        "duplicate_spans": _q_duplicate_spans,
        "remove_duplicate_spans": _q_remove_dup_spans,
        "unigram_logprob": _q_unigram_logprob,
        "occ_facts_typed": _q_occ_facts_typed,
        "quadkey_z12": _q_quadkey,
        "quadkey_rollup_z10": _q_quadkey_rollup,
        "cell_distinctive_terms": _q_cell_terms,
        "cell_lang_entropy": _q_cell_lang_entropy,
        "species_range": _q_species_range,
        "focal_density": _q_focal_density,
        "outlink_edges": _q_outlink_edges,
        "layer_simplify": _q_layer_simplify,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TR = f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/truth.parquet')"

# shared SQL fragments mirroring fgcspark.textops semantics
_SHINGLES = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM toks JOIN range(1, 4096) r(i) ON i <= len(t) - 2
    WHERE len(array_to_string(t[i:i+2], ' ')) > 0
), sz AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
"""

_MINHASH_COLS = ", ".join(
    f"min(({a} * (h % 2147483647) + {b}) % 2147483647) AS m{j}"
    for j, (a, b) in enumerate(
        zip(
            [1181, 2473, 3373, 4591, 5737, 6863, 7919, 9049, 10181, 11287, 12433, 13591, 14723, 15859, 17029, 18143],
            [7, 131, 239, 359, 467, 587, 709, 827, 941, 1061, 1181, 1301, 1429, 1549, 1663, 1787],
        )
    )
)

# 64-bit simhash as two unsigned 32-bit halves (mirrors fgcspark.textops.simhash):
# token bits j=0..31 from md5 hex chars 1-8 (h_lo), j=32..63 from chars 9-16 (h_hi).
_SIMHASH_VOTES = ", ".join(
    [f"sum(CASE WHEN (h_lo >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(32)]
    + [f"sum(CASE WHEN (h_hi >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{32 + j}" for j in range(32)]
)
_SIMHASH_LO = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
_SIMHASH_HI = " + ".join(f"(CASE WHEN s{32 + j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))

_DOT = "list_dot_product(a.v, b.v)"


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}
    # --- geo: generator truths -------------------------------------------
    sql["pages_extract_text"] = f"SELECT url, text AS extracted_text FROM {_TR}"
    sql["pages_points_wkt"] = f"SELECT url, point_wkt AS geo_wkt FROM {_TR}"
    sql["pages_footprint_types"] = f"SELECT url, fp_type AS geom_type FROM {_TR}"
    sql["pages_bbox_wkt"] = f"SELECT url, bbox_wkt FROM {_TR}"
    sql["pages_tiles"] = (
        f"SELECT url, cell_1km, cell_10km, cell_50km, cell_100km FROM {_TR}"
    )
    sql["tile_counts_10km"] = (
        f"SELECT cell_10km AS cell, count(*) AS n_docs FROM {_TR} GROUP BY 1"
    )
    sql["tile_counts_10km_salted"] = sql["tile_counts_10km"]
    sql["pages_cells_jvm"] = sql["pages_tiles"]
    sql["tile_rollup"] = (
        f"SELECT 10 AS res_km, cell_10km AS cell, count(*) AS n_docs FROM {_TR} GROUP BY 2"
        f" UNION ALL "
        f"SELECT 50, cell_50km, count(*) FROM {_TR} GROUP BY 2"
        f" UNION ALL "
        f"SELECT 100, cell_100km, count(*) FROM {_TR} GROUP BY 2"
    )
    sql["host_stats"] = f"""
        SELECT regexp_replace(regexp_replace(lower(
                   regexp_extract(url, '//([^/:?#]+)', 1)), '\\.$', ''),
               '^www\\.', '') AS host,
               count(*) AS n_pages,
               count(DISTINCT lang) AS n_langs,
               count(DISTINCT cell_100km) AS n_cells_100km
        FROM {_TR} GROUP BY 1
    """
    _host_expr = (
        "regexp_replace(regexp_replace(lower("
        "regexp_extract(url, '//([^/:?#]+)', 1)), '\\.$', ''), '^www\\.', '')"
    )
    sql["top_hosts_per_cell"] = f"""
        WITH agg AS (
            SELECT cell_100km AS cell, {_host_expr} AS host,
                   count(*) AS n_pages
            FROM {_TR} GROUP BY 1, 2
        )
        SELECT cell, host, n_pages, rank FROM (
            SELECT cell, host, n_pages,
                   CAST(row_number() OVER (
                       PARTITION BY cell ORDER BY n_pages DESC, host
                   ) AS INT) AS rank
            FROM agg
        ) WHERE rank <= 3
    """
    sql["lang_cell_rollup"] = f"""
        SELECT coalesce(lang, '*') AS lang,
               coalesce(cell_100km, '*') AS cell,
               count(*) AS n_pages
        FROM {_TR}
        GROUP BY ROLLUP (lang, cell_100km)
    """
    _rects_sql = ", ".join(
        f"({rid}, {x0}, {y0}, {x1}, {y1})" for rid, x0, y0, x1, y1 in _bench_rects()
    )
    sql["bbox_range_join"] = f"""
        SELECT r.rect_id, t.url
        FROM (VALUES {_rects_sql}) r(rect_id, x0, y0, x1, y1)
        JOIN {_TR} t
          ON t.e >= r.x0 AND t.e <= r.x1 AND t.n >= r.y0 AND t.n <= r.y1
    """
    sql["cell_ring_counts"] = f"""
        WITH counts AS (
            SELECT cell_10km AS cell, count(*) AS n_docs FROM {_TR} GROUP BY 1
        ),
        hot AS (SELECT cell, n_docs FROM counts ORDER BY n_docs DESC, cell LIMIT 20),
        parts AS (
            SELECT cell, n_docs,
                   CAST(string_split(cell, ':')[1] AS BIGINT) AS nb,
                   CAST(string_split(cell, ':')[2] AS BIGINT) AS eb
            FROM hot
        ),
        ring AS (
            SELECT p.cell, p.n_docs,
                   (p.nb + dn.x) || ':' || (p.eb + de.x) AS ncell
            FROM parts p
            CROSS JOIN range(-2, 3) dn(x)
            CROSS JOIN range(-2, 3) de(x)
        )
        SELECT r.cell, r.n_docs, CAST(SUM(c.n_docs) AS BIGINT) AS n_docs_ring
        FROM ring r JOIN counts c ON c.cell = r.ncell
        GROUP BY 1, 2
    """
    # Grid DBSCAN re-derived as a recursive-CTE transitive closure over
    # the same 8-neighborhood (vs the engine's frontier propagation)
    sql["dbscan_cells"] = f"""
        WITH RECURSIVE
        counts AS (
            SELECT cell_50km AS cell, count(*) AS n_docs FROM {_TR} GROUP BY 1
        ),
        -- the engine's fractional rule: max(2, round(min_frac * N)) —
        -- computed, not hardcoded, so the oracle tracks any corpus size
        mp AS (
            SELECT greatest(2, CAST(round(0.003 * sum(n_docs)) AS BIGINT)) AS v
            FROM counts
        ),
        parts AS (
            SELECT cell, n_docs,
                   CAST(string_split(cell, ':')[1] AS BIGINT) AS nb,
                   CAST(string_split(cell, ':')[2] AS BIGINT) AS eb
            FROM counts
        ),
        core AS (
            SELECT *, nb * 1048576 + eb AS k FROM parts
            WHERE n_docs >= (SELECT v FROM mp)
        ),
        edges AS (
            SELECT a.k AS ku, b.k AS kv FROM core a JOIN core b
              ON abs(a.nb - b.nb) <= 1 AND abs(a.eb - b.eb) <= 1 AND a.k <> b.k
        ),
        lbl(k, l) AS (
            SELECT k, k FROM core
            UNION
            SELECT e.ku, l.l FROM lbl l JOIN edges e ON e.kv = l.k
        ),
        fin AS (SELECT k, MIN(l) AS cluster FROM lbl GROUP BY k),
        borders AS (
            SELECT p.cell, p.n_docs, MIN(f.cluster) AS cluster
            FROM parts p
            JOIN core c ON abs(p.nb - c.nb) <= 1 AND abs(p.eb - c.eb) <= 1
            JOIN fin f ON f.k = c.k
            WHERE p.n_docs < (SELECT v FROM mp)
            GROUP BY 1, 2
        )
        SELECT c.cell, c.n_docs, 'core' AS role, CAST(f.cluster AS BIGINT) AS cluster
        FROM core c JOIN fin f ON f.k = c.k
        UNION ALL
        SELECT cell, n_docs, 'border' AS role, CAST(cluster AS BIGINT) AS cluster
        FROM borders
    """
    # Focal density re-derived as the DIRECT 2-D weighted neighborhood
    # sum (vs the engine's separable two-pass convolution) — integer
    # kernel makes the two formulations exactly equal
    sql["focal_density"] = f"""
        WITH counts AS (
            SELECT cell_10km AS cell, count(*) AS n_docs FROM {_TR} GROUP BY 1
        ),
        parts AS (
            SELECT cell, n_docs,
                   CAST(string_split(cell, ':')[1] AS BIGINT) AS nb,
                   CAST(string_split(cell, ':')[2] AS BIGINT) AS eb
            FROM counts
        ),
        w(d, w) AS (VALUES (-2, 1), (-1, 4), (0, 6), (1, 4), (2, 1))
        SELECT p.cell, p.n_docs,
               CAST(SUM(c.n_docs * wn.w * we.w) AS BIGINT) AS wsum,
               SUM(c.n_docs * wn.w * we.w) / 256.0 AS density
        FROM parts p
        CROSS JOIN w wn CROSS JOIN w we
        JOIN parts c ON c.nb = p.nb + wn.d AND c.eb = p.eb + we.d
        GROUP BY 1, 2
    """
    # Morton interleave re-derived in SQL with the same magic-number
    # spread (independent of the engine's Column expression tree)
    sql["pages_zorder"] = f"""
        WITH b0 AS (
            SELECT url,
                   CAST(floor(e / 1000) AS BIGINT) & 65535 AS eb,
                   CAST(floor(n / 1000) AS BIGINT) & 65535 AS nb
            FROM {_TR}
        ),
        b1 AS (SELECT url, (eb | (eb << 8)) & 16711935 AS eb,
                           (nb | (nb << 8)) & 16711935 AS nb FROM b0),
        b2 AS (SELECT url, (eb | (eb << 4)) & 252645135 AS eb,
                           (nb | (nb << 4)) & 252645135 AS nb FROM b1),
        b3 AS (SELECT url, (eb | (eb << 2)) & 858993459 AS eb,
                           (nb | (nb << 2)) & 858993459 AS nb FROM b2),
        b4 AS (SELECT url, (eb | (eb << 1)) & 1431655765 AS eb,
                           (nb | (nb << 1)) & 1431655765 AS nb FROM b3)
        SELECT url, (nb << 1) + eb AS zorder FROM b4
    """
    sql["dwithin_join_partitioned"] = (
        f"SELECT probe_id, url FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/dwithin.parquet')"
    )
    sql["dwithin_join"] = (
        f"SELECT probe_id, url FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/dwithin.parquet')"
    )
    sql["event_sessions"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts, event_id,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS duration_s,
               min(event_id) AS first_event
        FROM numbered GROUP BY 1, 2
    """
    sql["events_asof_join"] = """
        SELECT l.event_id, l.user_id,
               coalesce(r.event_id, -1) AS click_id,
               coalesce(r.value, -1.0) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """
    sql["pip_join"] = (
        f"SELECT url, poly_id FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/pip.parquet')"
    )
    sql["pip_join_partitioned"] = sql["pip_join"]
    sql["pip_anti_join"] = f"""
        SELECT url FROM {_TR} t
        WHERE NOT EXISTS (
            SELECT 1 FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/pip.parquet') p
            WHERE p.url = t.url)
    """
    sql["fp_layer_join"] = (
        f"SELECT url, poly_id FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/fpjoin.parquet')"
    )
    sql["fp_layer_join_partitioned"] = sql["fp_layer_join"]
    sql["pip_counts"] = (
        f"SELECT poly_id, count(*) AS n_pages FROM "
        f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/pip.parquet') GROUP BY 1"
    )
    sql["knn_k5"] = (
        f"SELECT probe_id, url FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/knn.parquet')"
    )
    sql["knn_k5_partitioned"] = sql["knn_k5"]
    # s2lite id arithmetic duplicated in SQL over the truth's E/N
    # (encoding: level<<58 | ix<<29 | iy; root anchored at (0, 6e6))
    _s2 = (
        "({lvl}::BIGINT << 58) + (CAST(floor(e / {s}) AS BIGINT) << 29)"
        " + CAST(floor((n - 6000000) / {s}) AS BIGINT)"
    )
    _l12 = _s2.format(lvl=12, s=512)
    _l10 = _s2.format(lvl=10, s=2048)
    sql["s2_cells_l12"] = (
        f"SELECT url, {_l12} AS s2_l12, {_l10} AS s2_l10 FROM {_TR}"
    )
    sql["s2_cell_counts_l10"] = (
        f"SELECT {_l10} AS s2_l10, count(*) AS n_docs FROM {_TR} GROUP BY 1"
    )
    sql["layer_hulls"] = (
        "SELECT poly_id, hull_wkt FROM "
        f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/layer_hulls.parquet')"
    )
    sql["layer_area_perimeter"] = (
        "SELECT poly_id, area_m2, perimeter_m FROM "
        f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/layer_stats.parquet')"
    )
    sql["layer_simplify"] = (
        "SELECT poly_id, simplified_wkt, n_vertices_before, n_vertices_after "
        f"FROM read_parquet('{GEO_DATA}/{ORACLE_SCALE}/layer_simplify.parquet')"
    )
    from fgcspark.cells.geohash import geohash_sql as _gh_sql

    _glon = "CAST(lon_s AS DOUBLE)"
    _glat = "CAST(lat_s AS DOUBLE)"
    sql["geohash_p6"] = (
        f"SELECT url, {_gh_sql(_glon, _glat, 6)} AS gh6 FROM {_TR} "
        "WHERE lon_s IS NOT NULL AND lat_s IS NOT NULL"
    )
    sql["geohash_counts_p5"] = (
        f"SELECT {_gh_sql(_glon, _glat, 5)} AS gh5, count(*) AS n_docs FROM {_TR} "
        "WHERE lon_s IS NOT NULL AND lat_s IS NOT NULL GROUP BY 1"
    )
    from fgcspark.cells.quadkey import quadkey_sql as _qk_sql

    _qk12 = _qk_sql(_glon, _glat, 12)
    sql["quadkey_z12"] = (
        f"SELECT url, {_qk12} AS qk12 FROM {_TR} "
        "WHERE lon_s IS NOT NULL AND lat_s IS NOT NULL"
    )
    # z=10 derived by prefix slice of the SAME z=12 formula, mirroring
    # the engine's substring rollup (not an independent z=10 projection)
    sql["quadkey_rollup_z10"] = (
        f"SELECT substring({_qk12}, 1, 10) AS qk10, count(*) AS n_docs FROM {_TR} "
        "WHERE lon_s IS NOT NULL AND lat_s IS NOT NULL GROUP BY 1"
    )
    # geo x webtext fusion: the op's module owns its SQL twin (the
    # cells/geohash precedent); scores rounded before ranking (see
    # fgcspark/geotext.py for the ulp contract)
    from fgcspark.geotext import cell_distinctive_terms_oracle_sql as _tfidf_sql

    sql["cell_distinctive_terms"] = _tfidf_sql(_TR, k=5)
    sql["species_range"] = f"""
        WITH m AS (
            SELECT unnest(regexp_extract_all(text, 'species_\\d+')) AS entity,
                   e, n, cell_50km
            FROM {_TR}
        )
        SELECT entity, count(*) AS n_mentions,
               count(DISTINCT cell_50km) AS n_cells,
               round(min(e), 3) AS min_e, round(max(e), 3) AS max_e,
               round(min(n), 3) AS min_n, round(max(n), 3) AS max_n
        FROM m GROUP BY 1
    """
    sql["species_cooccurrence"] = f"""
        WITH m AS (
            SELECT unnest(regexp_extract_all(text, 'species_\\d+')) AS entity,
                   cell_50km AS cell
            FROM {_TR}
        ),
        pres AS MATERIALIZED (SELECT DISTINCT entity, cell FROM m)
        SELECT a.entity AS entity_a, b.entity AS entity_b,
               count(*) AS n_shared_cells
        FROM pres a JOIN pres b ON a.cell = b.cell AND a.entity < b.entity
        GROUP BY 1, 2
    """
    # spatial autocorrelation: the op's module owns both SQL twins
    from fgcspark.hotspots import getis_ord_oracle_sql as _gi_sql
    from fgcspark.hotspots import morans_i_oracle_sql as _mi_sql

    sql["getis_ord_gi10"] = _gi_sql(_TR)
    sql["morans_i_10km"] = _mi_sql(_TR)
    sql["cell_lang_entropy"] = f"""
        WITH cl AS MATERIALIZED (
            SELECT cell_50km AS cell, lang, count(*) AS n FROM {_TR} GROUP BY 1, 2
        ),
        tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_docs FROM cl GROUP BY 1)
        SELECT cl.cell AS cell, max(n_docs) AS n_docs, count(*) AS n_langs,
               -- + 0.0 normalizes DuckDB's -0.0 (monolingual cells) to the
               -- +0.0 Spark emits, keeping value serialization identical
               round(-sum((n / CAST(n_docs AS DOUBLE))
                          * ln(n / CAST(n_docs AS DOUBLE))), 6) + 0.0 AS entropy
        FROM cl JOIN tot ON cl.cell = tot.cell
        GROUP BY 1
    """
    # hex axial id re-derived in SQL from the module's own SQL twin
    # (identical literals/operator order; divergence surface is only
    # the generator-vs-engine e/n inputs, as for the km tiles)
    from fgcspark.cells.hexgrid import hex_id_sql as _hex_sql

    _hex = _hex_sql("e", "n", 5000.0)
    sql["hex_cells_5km"] = f"SELECT url, {_hex} AS hex_id FROM {_TR}"
    sql["hex_cell_counts"] = (
        f"SELECT {_hex} AS hex_id, count(*) AS n_docs FROM {_TR} GROUP BY 1"
    )
    sql["hex_ring_counts"] = f"""
        WITH counts AS (
            SELECT {_hex} AS hex_id, count(*) AS n_docs FROM {_TR} GROUP BY 1
        ),
        hot AS (
            SELECT hex_id, n_docs FROM counts ORDER BY n_docs DESC, hex_id LIMIT 20
        ),
        parts AS (
            SELECT hex_id, n_docs,
                   (hex_id >> 21) - 1048576 AS q,
                   (hex_id & 2097151) - 1048576 AS r
            FROM hot
        ),
        ring AS (
            SELECT p.hex_id, p.n_docs,
                   (((p.q + dq.x + 1048576) << 21) + (p.r + dr.x + 1048576)) AS nid
            FROM parts p
            CROSS JOIN range(-2, 3) dq(x)
            CROSS JOIN range(-2, 3) dr(x)
            WHERE abs(dq.x + dr.x) <= 2
        )
        SELECT g.hex_id, g.n_docs, CAST(SUM(c.n_docs) AS BIGINT) AS n_docs_ring
        FROM ring g JOIN counts c ON c.hex_id = g.nid
        GROUP BY 1, 2
    """
    sql["chunked_resume"] = f"SELECT url, cell_10km FROM {_TR}"
    sql["raster_tiles_100km"] = f"""
        SELECT cell_100km AS cell,
               CAST((CAST(floor(n / 10000) AS BIGINT) % 10) * 10
                    + (CAST(floor(e / 10000) AS BIGINT) % 10) AS INT) AS sub_idx,
               count(*) AS n_docs
        FROM {_TR} GROUP BY 1, 2
    """
    sql["raster_dense_100km"] = f"""
        WITH sparse AS (
            SELECT cell_100km AS cell,
                   CAST((CAST(floor(n / 10000) AS BIGINT) % 10) * 10
                        + (CAST(floor(e / 10000) AS BIGINT) % 10) AS INT) AS i,
                   count(*) AS cnt
            FROM {_TR} GROUP BY 1, 2
        )
        SELECT c.cell,
               array_to_string(list(coalesce(s.cnt, 0) ORDER BY idx.k), ',') AS raster_csv
        FROM (SELECT DISTINCT cell FROM sparse) c
        CROSS JOIN range(0, 100) idx(k)
        LEFT JOIN sparse s ON s.cell = c.cell AND s.i = idx.k
        GROUP BY c.cell
    """
    sql["raster_roundtrip_100km"] = sql["raster_tiles_100km"]
    sql["chunk_window"] = (
        f"SELECT url, lang FROM {_TR} ORDER BY url LIMIT 50 OFFSET 100"
    )
    sql["streamed_points"] = f"SELECT url, cell_10km FROM {_TR}"
    sql["iceberg_merge_upsert"] = """
        WITH ups AS (
            SELECT doc_id, text, 'xx' AS lang, source, n_chars
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
            FROM documents WHERE doc_id % 97 = 0
        )
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM ups)
        UNION ALL
        SELECT * FROM ups
    """
    # session_window strict boundary: a gap of EXACTLY 30 min starts a
    # new session (merge iff next_ts < prev_ts + gap)
    sql["streamed_sessions"] = """
        WITH d AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM d
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """
    _OCC_R = f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/occ_rows.parquet')"
    _OCC_F = f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/occ_facts.parquet')"
    _FACTS = [
        ("Havainnon laatu", "Havainnon_laatu"),
        ("Havainnon maaran yksikko", "Havainnon_maaran_yksikko"),
        (
            "Museo, johon lajista keratty nayte on talletettu",
            "Museo_johon_lajista_keratty_nayte_on_talletettu",
        ),
        ("Vesistoalue", "Vesistoalue"),
        ("Sijainnin tarkkuusluokka", "Sijainnin_tarkkuusluokka"),
        ("Pesintatulos", "Pesintatulos"),
        ("Seurattava laji", "Seurattava_laji"),
    ]
    _pivot_cols = ",\n".join(
        f"min_by(Value, ord) FILTER (WHERE Fact = '{raw}') AS {san}"
        for raw, san in _FACTS
    )
    sql["occ_facts_join"] = f"""
        SELECT r.occurrenceID, r.scientificName,
               coalesce(r.individualCount, -1) AS individualCount,
               r.eventDateTime, r.municipality,
               r.coordinateUncertaintyInMeters,
               {", ".join(f"coalesce(p.{san}, '') AS {san}" for _, san in _FACTS)}
        FROM {_OCC_R} r
        LEFT JOIN (
            SELECT Parent, {_pivot_cols}
            FROM {_OCC_F}
            WHERE Fact IN ({", ".join("'" + raw + "'" for raw, _ in _FACTS)})
            GROUP BY Parent
        ) p ON r.occurrenceID = p.Parent
    """
    # --- citable-archive load (independent TSV parse of the extracted
    # members; engine reads the zip) ----------------------------------------
    _HBF = f"{GEO_DATA}/{ORACLE_SCALE}/hbf_extracted"
    _csv = (
        lambda m: f"read_csv('{_HBF}/{m}_HBF.90001.tsv', delim='\t', "
        "header=true, quote='', all_varchar=true)"
    )

    def _fact_cte(member: str, names: list[str]) -> str:
        import re as _re

        cols = ",\n".join(
            f"min(Value) FILTER (WHERE Fact = '{raw}') AS "
            f'"{_re.sub(chr(92) + "W", "", _re.sub(chr(92) + "s", "_", raw))}"'
            for raw in names
        )
        inlist = ", ".join(f"'{raw}'" for raw in names)
        return (
            f"SELECT Parent, {cols} FROM {_csv(member)}"
            f" WHERE Fact IN ({inlist}) GROUP BY Parent"
        )

    _REC = ["Havainnon laatu", "Havainnon määrän yksikkö",
            "Museo, johon lajista kerätty näyte on talletettu"]
    _EVT = ["Vesistöalue", "Sijainnin tarkkuusluokka", "Pesintätulos"]
    _DOC = ["Seurattava laji"]
    sql["occ_archive_load"] = f"""
        WITH r AS (SELECT * FROM {_csv('rows')}),
        uf AS ({_fact_cte('unit_facts', _REC)}),
        gf AS ({_fact_cte('gathering_facts', _EVT)}),
        df_ AS ({_fact_cte('document_facts', _DOC)})
        SELECT r."Unit.UnitID" AS occurrenceID,
               r."Gathering.GatheringID" AS eventID,
               r."Document.DocumentID" AS datasetID,
               r."Taxon.ScientificName" AS scientificName,
               coalesce(r."Unit.Abundance", '') AS organismQuantity,
               r."Gathering.DisplayDateTime" AS eventDate,
               r."Gathering.Interpretations.Municipality" AS municipality,
               coalesce(r."Gathering.Conversions.WGS84CenterPoint.Lat(N)", '') AS decimalLatitude,
               coalesce(r."Gathering.Conversions.WGS84CenterPoint.Lon(E)", '') AS decimalLongitude,
               coalesce(r."Gathering.Conversions.WGS84_WKT", '') AS footprintWKT,
               r."Unit.Notes" AS UnitNotes,
               coalesce(uf."Havainnon_laatu", '') AS Havainnon_laatu,
               coalesce(uf."Havainnon_määrän_yksikkö", '') AS "Havainnon_määrän_yksikkö",
               coalesce(uf."Museo_johon_lajista_kerätty_näyte_on_talletettu", '')
                   AS "Museo_johon_lajista_kerätty_näyte_on_talletettu",
               coalesce(gf."Vesistöalue", '') AS "Vesistöalue",
               coalesce(gf."Sijainnin_tarkkuusluokka", '') AS Sijainnin_tarkkuusluokka,
               coalesce(gf."Pesintätulos", '') AS "Pesintätulos",
               coalesce(df_."Seurattava_laji", '') AS Seurattava_laji
        FROM r
        LEFT JOIN uf ON r."Unit.UnitID" = uf.Parent
        LEFT JOIN gf ON r."Gathering.GatheringID" = gf.Parent
        LEFT JOIN df_ ON r."Document.DocumentID" = df_.Parent
    """
    # --- multimodal binary ops (pages html = the opaque blob) --------------
    _PG = f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/pages.parquet')"
    sql["iceberg_pruned_scan"] = f"""
        SELECT lang, count(*) AS n_pages FROM {_PG}
        WHERE url BETWEEN 'https://site2' AND 'https://site5'
        GROUP BY 1
    """
    # drained streaming dedup = distinct content fingerprints of the
    # ORIGINAL corpus: the injected recrawl copies must add nothing
    sql["streamed_dedup"] = f"""
        SELECT DISTINCT try_cast(concat('0x', substring(
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
                   1, 14)) AS BIGINT) AS fp
        FROM {_PG}
    """
    # real header parse: the SQL twin is generated by the op's module
    # (three independent parsers — Catalyst / Python / DuckDB)
    from fgcspark.multimodal import HEX_WINDOW as _HW
    from fgcspark.multimodal import media_header_sql as _hdr_sql

    _PGM = f"read_parquet('{GEO_DATA}/{ORACLE_SCALE}/media.parquet')"
    _HSRC = (
        f"hsrc AS (SELECT url, CAST(octet_length(media) AS BIGINT) AS n_bytes, "
        f"substring(upper(hex(media)), 1, {2 * _HW}) AS hx, "
        "try_cast(concat('0x', substring(md5(upper(hex(media))), 1, 14)) AS BIGINT) AS fp "
        f"FROM {_PGM})"
    )
    # sentinels mirror _desentinel: NULL -> '' / -1 so the driver's
    # value sort never compares None against int
    _SENT = (
        "coalesce(fmt, '') AS fmt, coalesce(width, -1) AS width, "
        "coalesce(height, -1) AS height, coalesce(channels, -1) AS channels"
    )
    sql["media_metadata"] = (
        f"WITH {_HSRC},\n{_hdr_sql()}\n"
        f"SELECT url, n_bytes, {_SENT}, fp FROM hdr"
    )
    sql["media_decode_stub"] = (
        f"WITH {_HSRC},\n{_hdr_sql()}\nSELECT url, {_SENT} FROM hdr"
    )
    sql["media_resize"] = (
        f"WITH {_HSRC},\n{_hdr_sql()}\n"
        + """
        SELECT url,
               CAST(CASE WHEN width IS NULL OR height IS NULL THEN -1
                    WHEN greatest(width, height) <= 256 THEN width
                    ELSE greatest(CAST(floor(width * (256.0 / greatest(width, height))) AS BIGINT), 1) END AS INT) AS out_width,
               CAST(CASE WHEN width IS NULL OR height IS NULL THEN -1
                    WHEN greatest(width, height) <= 256 THEN height
                    ELSE greatest(CAST(floor(height * (256.0 / greatest(width, height))) AS BIGINT), 1) END AS INT) AS out_height
        FROM hdr
    """
    )
    # frame hash = md5 over the window's uppercase hex (DuckDB 1.0 has
    # no md5(BLOB); hex is injective so this is still a content hash)
    sql["media_frames"] = f"""
        SELECT url, CAST(k AS INT) AS frame_idx,
               md5(substring(upper(hex(media)), CAST(k * 128 + 1 AS BIGINT), 128)) AS frame_md5
        FROM {_PGM}, range(0, 8) r(k)
        WHERE k < least(8, CAST(floor(octet_length(media) / 64) AS BIGINT))
    """
    # --- web link graph -----------------------------------------------------
    _OL = (
        "unnest(regexp_extract_all(decode(html), "
        "'<link rel=\"outlink\" href=\"([^\"]+)\">', 1)) AS l(ol)"
    )

    def _h(col: str) -> str:
        # mirrors parse_url(HOST) semantics exactly: userinfo stripped
        # (non-capturing [^/@]*@) and no-match -> NULL (DuckDB's
        # regexp_extract returns '' there, so nullif)
        return (
            "regexp_replace(regexp_replace(lower(nullif("
            f"regexp_extract({col}, '//(?:[^/@]*@)?([^/:?#]+)', 1), ''))"
            ", '\\.$', ''), '^www\\.', '')"
        )

    sql["outlink_edges"] = f"SELECT url, l.ol AS outlink FROM {_PG}, {_OL}"
    _LG = (
        f"SELECT {_h('url')} AS src_host, {_h('l.ol')} AS dst_host, "
        f"count(*) AS n_links FROM {_PG}, {_OL} GROUP BY 1, 2"
    )
    sql["host_linkgraph"] = _LG
    # PageRank: the engine's fixed-iteration recurrence unrolled as CTEs
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, which makes a 10-stage recurrence referencing its
    # predecessor twice exponential to evaluate
    _pr = [
        f"WITH edges AS MATERIALIZED ({_LG}),",
        "nodes AS MATERIALIZED (SELECT DISTINCT host FROM"
        f" (SELECT {_h('url')} AS host FROM {_PG}"
        " UNION SELECT dst_host FROM edges)),",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),",
        "outw AS MATERIALIZED (SELECT src_host, SUM(n_links) AS ow FROM edges GROUP BY 1),",
        "w AS MATERIALIZED (SELECT e.src_host, e.dst_host, e.n_links * 1.0 / o.ow AS frac"
        " FROM edges e JOIN outw o USING (src_host)),",
        "r0 AS MATERIALIZED (SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),",
    ]
    for t in range(1, 11):
        p = t - 1
        _pr.append(
            f"d{t} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS dm FROM r{p}"
            " WHERE host NOT IN (SELECT src_host FROM outw)),"
        )
        _pr.append(
            f"c{t} AS MATERIALIZED (SELECT w.dst_host AS host, SUM(r.rank * w.frac) AS cin"
            f" FROM w JOIN r{p} r ON r.host = w.src_host GROUP BY 1),"
        )
        _pr.append(
            f"r{t} AS MATERIALIZED (SELECT n.host,"
            " (1.0 - 0.85) / (SELECT n FROM nn)"
            f" + 0.85 * (COALESCE(c.cin, 0) + (SELECT dm FROM d{t}) / (SELECT n FROM nn))"
            f" AS rank FROM nodes n LEFT JOIN c{t} c ON c.host = n.host),"
        )
    _pr.append("fin AS (SELECT host, rank FROM r10) SELECT * FROM fin")
    sql["host_pagerank"] = "\n".join(_pr)
    # --- relational --------------------------------------------------------
    sql["line_dedup"] = """
        WITH src AS (
            SELECT doc_id, lang,
                   concat('cookie notice accept all terms of service privacy policy please ',
                          CASE WHEN doc_id % 2 = 0
                               THEN 'subscribe to our newsletter for updates and special offers today '
                               ELSE '' END,
                          text) AS text
            FROM documents
        ),
        w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM src),
        l AS (
            SELECT doc_id, lang, i AS pos,
                   array_to_string(words[(i*10+1):(i*10+10)], ' ') AS line
            FROM w JOIN range(0, 4096) r(i) ON i < ceil(len(words) / 10.0)
        ),
        h AS (
            SELECT doc_id, lang, pos, line,
                   CAST(concat('0x', substring(md5(line), 1, 14)) AS BIGINT) AS line_h
            FROM l
        ),
        boiler AS (
            SELECT lang, line_h FROM h
            GROUP BY lang, line_h HAVING count(DISTINCT doc_id) > 2
        )
        SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text
        FROM h
        WHERE NOT EXISTS (
            SELECT 1 FROM boiler b WHERE b.lang = h.lang AND b.line_h = h.line_h)
        GROUP BY 1
    """
    sql["decontaminate"] = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
            FROM toks JOIN range(1, 4096) r(i) ON i <= len(t) - 2
            WHERE len(array_to_string(t[i:i+2], ' ')) > 0
        ), ev AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
        )
        SELECT doc_id, count(*) AS n_hits
        FROM sh JOIN ev USING (shingle)
        WHERE doc_id % 97 <> 0
        GROUP BY 1
    """
    # streaming twin: same trigram scan, finalized per event-time day
    # window (ts = 2021-06-08 + doc_id*37 s, the staged stream's clock)
    sql["streamed_decontaminate"] = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
            FROM toks JOIN range(1, 4096) r(i) ON i <= len(t) - 2
            WHERE len(array_to_string(t[i:i+2], ' ')) > 0
        ), ev AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
        )
        SELECT CAST(date_trunc('day', TIMESTAMP '2021-06-08 00:00:00'
                   + doc_id * INTERVAL 37 SECOND) AS TIMESTAMP) AS window_start,
               doc_id, count(*) AS n_hits
        FROM sh JOIN ev USING (shingle)
        WHERE doc_id % 97 <> 0
        GROUP BY 1, 2
    """
    _PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    _PII_PHONE = "\\+\\d{9,14}"
    sql["pii_scrub"] = f"""
        WITH injected AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                           ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN ' call +35855' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
                           ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(text, '{_PII_IP}')) AS n_ips,
               len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IP}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
        FROM injected
    """
    sql["duplicate_spans"] = """
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), g AS (
            SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS gram
            FROM d, UNNEST(range(len(w) - 7)) AS t(i)
            WHERE len(w) >= 8
        ), dup AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
        ), hits AS (
            SELECT doc_id, pos FROM g JOIN dup USING (gram)
        ), isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos <= lag(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) + 8
                        THEN 0 ELSE 1 END AS brk
            FROM hits
        ), isl2 AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isle
            FROM isl
        )
        SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
               max(pos) - min(pos) + 8 AS span_tokens
        FROM isl2 GROUP BY doc_id, isle
    """
    sql["remove_duplicate_spans"] = """
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), g AS (
            SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS gram
            FROM d, UNNEST(range(len(w) - 7)) AS t(i)
            WHERE len(w) >= 8
        ), dup AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) > 1
        ), hits AS (
            SELECT doc_id, pos FROM g JOIN dup USING (gram)
        ), isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos <= lag(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) + 8
                        THEN 0 ELSE 1 END AS brk
            FROM hits
        ), isl2 AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isle
            FROM isl
        ), spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
            FROM isl2 GROUP BY doc_id, isle
        ), tok AS (
            SELECT doc_id, i AS pos, w[i+1] AS t
            FROM d, UNNEST(range(len(w))) AS r(i)
        ), kept AS (
            SELECT doc_id, pos, t FROM tok
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tok.doc_id AND tok.pos BETWEEN s.s AND s.e)
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.t, ' ' ORDER BY k.pos), '') AS clean_text
        FROM d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id
    """
    sql["unigram_logprob"] = """
        WITH tok AS (
            SELECT doc_id, u.t AS tok
            FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        ), c AS (
            SELECT tok, count(*) AS c FROM tok GROUP BY tok
        ), tot AS (
            SELECT sum(c) AS total FROM c
        ), lp AS (
            SELECT tok, ln(c) - ln(total) AS lp FROM c, tot
        )
        SELECT doc_id, round(avg(lp), 6) AS logprob
        FROM tok JOIN lp USING (tok)
        GROUP BY doc_id
    """
    sql["occ_facts_typed"] = f"""
        SELECT Parent AS occurrenceID,
               coalesce(min_by(Value, ord) FILTER (WHERE Fact = 'Havainnon laatu'), '') AS laatu,
               coalesce(min_by(IntValue, ord) FILTER (WHERE Fact = 'Sijainnin tarkkuusluokka'), -1) AS tarkkuus,
               coalesce(min_by(DecimalValue, ord) FILTER (WHERE Fact = 'Vesistoalue'), -1.0) AS vesisto
        FROM {_OCC_F}
        WHERE Fact IN ('Havainnon laatu', 'Sijainnin tarkkuusluokka', 'Vesistoalue')
        GROUP BY 1
    """
    sql["facts_pivot"] = """
        SELECT user_id,
               min_by(value, event_id) FILTER (WHERE event_type ='click') AS click,
               min_by(value, event_id) FILTER (WHERE event_type ='view') AS view,
               min_by(value, event_id) FILTER (WHERE event_type ='purchase') AS purchase,
               min_by(value, event_id) FILTER (WHERE event_type ='signup') AS signup,
               min_by(value, event_id) FILTER (WHERE event_type ='error') AS error
        FROM events GROUP BY 1
    """
    sql["latest_event_per_user"] = """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """
    sql["lineitem_agg"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
               count(*) AS n_rows
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY 1, 2
    """
    sql["revenue_by_nation"] = """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """
    # --- training-data ops --------------------------------------------------
    sql["exact_dedup"] = (
        "SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY text"
    )
    sql["ngram_jaccard_pairs"] = (
        _SHINGLES
        + """
        SELECT id_a, id_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b
        FROM pairs
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE 100 * common >= 6 * (sa.n_sh + sb.n_sh - common)
        """
    )
    sql["minhash_lsh_pairs"] = (
        _SHINGLES.rstrip()
        + f""", hashed AS (
            SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 14)) AS BIGINT) AS h
            FROM sh
        ), mh AS (
            SELECT doc_id, {_MINHASH_COLS} FROM hashed GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band, concat(m0, ',', m1, ',', m2, ',', m3) AS bkey FROM mh
            UNION ALL
            SELECT doc_id, 1, concat(m4, ',', m5, ',', m6, ',', m7) FROM mh
            UNION ALL
            SELECT doc_id, 2, concat(m8, ',', m9, ',', m10, ',', m11) FROM mh
            UNION ALL
            SELECT doc_id, 3, concat(m12, ',', m13, ',', m14, ',', m15) FROM mh
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b USING (band, bkey)
            WHERE a.doc_id < b.doc_id
        ), hdist AS (
            -- mirror of the engine's hashed-shingle verify payload:
            -- intersection/sizes over DISTINCT 56-bit shingle hashes
            SELECT DISTINCT doc_id, h FROM hashed
        ), hsz AS (
            SELECT doc_id, count(*) AS n_sh FROM hdist GROUP BY 1
        ), hpairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
            FROM hdist a JOIN hdist b USING (h)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        )
        SELECT id_a, id_b, common, sa.n_sh AS n_a, sb.n_sh AS n_b
        FROM cand
        JOIN hpairs USING (id_a, id_b)
        JOIN hsz sa ON sa.doc_id = id_a
        JOIN hsz sb ON sb.doc_id = id_b
        WHERE 100 * common >= 6 * (sa.n_sh + sb.n_sh - common)
        """
    )
    sql["dedup_clusters"] = f"""
        WITH RECURSIVE edges AS (
            SELECT id_a, id_b FROM ({sql['minhash_lsh_pairs']})
        ), sym AS (
            SELECT id_a AS u, id_b AS v FROM edges
            UNION
            SELECT id_b, id_a FROM edges
        ), reach(u, v) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        )
        SELECT u AS doc_id, CAST(min(v) AS BIGINT) AS cluster_id,
               u = min(v) AS is_keeper
        FROM reach GROUP BY u
    """
    sql["simhash_pairs"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS h_lo,
                   CAST(concat('0x', substring(md5(tok), 9, 8)) AS BIGINT) AS h_hi
            FROM toks WHERE len(tok) > 0
        ), votes AS (
            SELECT doc_id, {_SIMHASH_VOTES} FROM hashed GROUP BY doc_id
        ), sh AS (
            SELECT doc_id, CAST({_SIMHASH_LO} AS BIGINT) AS sim_lo,
                   CAST({_SIMHASH_HI} AS BIGINT) AS sim_hi
            FROM votes
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sim_lo, b.sim_lo))
                    + bit_count(xor(a.sim_hi, b.sim_hi)) AS INT) AS hamming
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.sim_lo, b.sim_lo))
              + bit_count(xor(a.sim_hi, b.sim_hi)) <= 3
    """
    sql["langid"] = """
        WITH c AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of'))) AS c_en,
                   len(list_filter(string_split(text, ' '), t -> t IN ('el','la','de'))) AS c_es,
                   len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das'))) AS c_de
            FROM documents
        )
        SELECT doc_id, c_en, c_es, c_de,
               CASE WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
                    WHEN c_es >= c_de THEN 'es'
                    ELSE 'de' END AS lang_pred
        FROM c
    """
    sql["quality_signals"] = """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
               len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','value','table'))) AS n_stop
        FROM documents
    """
    sql["token_counts"] = """
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpeish,
               len(string_split(text, ' ')) AS n_ws
        FROM documents
    """
    sql["token_percentiles"] = """
        SELECT lang,
               quantile_cont(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')), 0.5) AS p50,
               quantile_cont(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')), 0.9) AS p90,
               quantile_cont(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')), 0.99) AS p99
        FROM documents GROUP BY lang
    """
    sql["doc_fingerprint"] = """
        SELECT doc_id,
               CAST(concat('0x', substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 14)) AS BIGINT) AS fp
        FROM documents
    """
    # deterministic sampling family — same md5-56 key hash re-derived
    # in DuckDB (thresholds/quotas identical by construction)
    from fgcspark.sampling import HASH_SPACE as _HS
    from fgcspark.sampling import split_sql as _split_sql

    _kh = "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)"
    sql["hash_sample_25pct"] = f"""
        SELECT doc_id, lang FROM documents WHERE {_kh} < {int(0.25 * _HS)}
    """
    sql["hash_split_801010"] = f"""
        SELECT doc_id, {_split_sql(_SPLIT_WEIGHTS, "doc_id")} AS split FROM documents
    """
    sql["quota_sample_lang"] = f"""
        SELECT doc_id, lang FROM documents
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY {_kh}, doc_id) <= 20
    """
    from fgcspark.urlops import canonical_url_sql as _curl_sql

    _mkurl = (
        "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END,"
        " 'Site', CAST(doc_id % 7 AS VARCHAR), '.Example',"
        " CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)"
        "      WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END,"
        " CASE WHEN doc_id % 5 = 0 THEN '' ELSE concat('/P/', CAST(doc_id AS VARCHAR)) END,"
        " CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&b=2&a=1#frag'"
        "      ELSE '?z=9&utm_campaign=c&a=1&gclid=g' END)"
    )
    sql["canonical_urls"] = (
        f"SELECT doc_id, {_curl_sql(_mkurl)} AS canon FROM documents"
    )
    # recrawl-dedup corpus: same construction as the Spark query (the
    # canonical key is a function of doc_id mod 60, forcing ~8 snapshot
    # variants per canonical at sf0.01)
    _mkurl2 = (
        "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END,"
        " 'Site', CAST(doc_id % 3 AS VARCHAR), '.Example',"
        " CASE WHEN doc_id % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)"
        "      WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END,"
        " concat('/p/', CAST(doc_id % 5 AS VARCHAR)),"
        " CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1#frag'"
        "      WHEN doc_id % 4 = 1 THEN '?b=2&a=1' ELSE '' END)"
    )
    sql["latest_crawl_dedup"] = f"""
        WITH u AS (
            SELECT {_curl_sql(_mkurl2)} AS canon_url,
                   {_mkurl2} AS url,
                   CAST((doc_id * 37) % 100000 AS BIGINT) AS crawl_ts
            FROM documents
        )
        SELECT canon_url, url, crawl_ts FROM u
        QUALIFY row_number() OVER (
            PARTITION BY canon_url ORDER BY crawl_ts DESC, url DESC) = 1
    """
    # exact semantic (normalized-text equality, NOT the engine's
    # fingerprint) — the r5 engine verifies fingerprint hits by text,
    # so the oracle can state the pure set-difference definition
    sql["incremental_dedup"] = """
        WITH base AS (
            SELECT doc_id, doc_id % 5 = 0 AS in_corpus,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
            FROM documents
        ),
        batch AS (
            SELECT doc_id, nt FROM base WHERE NOT in_corpus
            UNION ALL
            SELECT doc_id + 100000, nt FROM base WHERE in_corpus
        )
        SELECT b.doc_id FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM base c WHERE c.in_corpus AND c.nt = b.nt)
    """
    sql["balanced_sample_lang"] = f"""
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        m AS (SELECT min(n) AS mn FROM c),
        r AS (SELECT lang, CAST(mn AS DOUBLE) / n AS rate FROM c, m)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN r ON d.lang = r.lang
        WHERE CAST({_kh} AS DOUBLE) < r.rate * 72057594037927936.0
    """
    sql["training_shuffle"] = f"""
        SELECT doc_id,
               row_number() OVER (ORDER BY {_kh}, doc_id) AS rank
        FROM documents
    """
    sql["top_tokens_per_lang"] = """
        WITH toks AS (
            SELECT lang,
                   unnest(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS tok
            FROM documents
        ),
        c AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY lang, tok)
        SELECT lang, tok, CAST(n AS BIGINT) AS n,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS INT) AS rank
        FROM c
        QUALIFY rank <= 20
    """
    sql["repetition_signals"] = """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        g AS (
            SELECT doc_id, len(words) AS n_words,
                   list_transform(generate_series(1, greatest(len(words) - 1, 0)),
                                  i -> concat_ws(' ', words[i], words[i + 1])) AS g2,
                   list_transform(generate_series(1, greatest(len(words) - 2, 0)),
                                  i -> concat_ws(' ', words[i], words[i + 1], words[i + 2])) AS g3
            FROM w
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CASE WHEN len(g2) <= 0 THEN 0.0
                    ELSE (len(g2) - len(list_distinct(g2))) / len(g2) END AS dup_2gram_frac,
               CASE WHEN len(g3) <= 0 THEN 0.0
                    ELSE (len(g3) - len(list_distinct(g3))) / len(g3) END AS dup_3gram_frac
        FROM g
    """
    sql["oov_rate"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM (
                SELECT tok, count(*) AS n FROM toks GROUP BY tok
                ORDER BY n DESC, tok LIMIT 1000
            )
        )
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) / count(*) AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id
    """
    # greedy packing re-derived with a recursive CTE: same token
    # expression, same md5-56 hash-bucket shard, same
    # new-bin-iff-overflow rule, same id order per (lang, shard) stream
    sql["pack_sequences"] = """
        WITH RECURSIVE t AS (
            SELECT lang,
                   CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 16 AS INT) AS shard,
                   doc_id,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS INT) AS n_tokens,
                   row_number() OVER (PARTITION BY lang,
                       CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 16
                       ORDER BY doc_id) AS rn
            FROM documents
        ),
        p AS (
            SELECT lang, shard, doc_id, n_tokens, rn,
                   CAST(1 AS BIGINT) AS bin_id, CAST(n_tokens AS BIGINT) AS acc
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.lang, t.shard, t.doc_id, t.n_tokens, t.rn,
                   CASE WHEN p.acc + t.n_tokens > 4096 THEN p.bin_id + 1 ELSE p.bin_id END,
                   CASE WHEN p.acc + t.n_tokens > 4096 THEN t.n_tokens ELSE p.acc + t.n_tokens END
            FROM p JOIN t ON t.lang = p.lang AND t.shard = p.shard AND t.rn = p.rn + 1
        )
        SELECT lang, shard, doc_id, n_tokens, bin_id FROM p
    """
    sql["embed_neardup"] = """
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    """
    sql["ann_topk_brute"] = """
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        ), q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id < 5)
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, v.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_dot_product(q.qv, v.v) / (q.qn * v.nrm) DESC, v.vec_id
                   ) AS rn
            FROM v, q WHERE v.vec_id <> q.query_id
        ) WHERE rn <= 10
    """
    sql["embed_neardup_ivf"] = """
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        ), cent AS (
            SELECT vec_id AS cid, v AS cv, nrm AS cn FROM v WHERE vec_id % 50 = 0
        ), assigned AS (
            SELECT vec_id, v, nrm, cid FROM (
                SELECT v.vec_id, v.v, v.nrm, cent.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_dot_product(v.v, cent.cv) / (v.nrm * cent.cn) DESC, cent.cid
                       ) AS rn
                FROM v, cent
            ) WHERE rn = 1
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assigned a JOIN assigned b USING (cid)
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    """
    sql["ann_topk_ivf"] = """
        WITH v AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        ), cent AS (
            SELECT vec_id AS cid, v AS cv, nrm AS cn FROM v WHERE vec_id % 50 = 0
        ), assigned AS (
            SELECT vec_id, v, nrm, cid FROM (
                SELECT v.vec_id, v.v, v.nrm, cent.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_dot_product(v.v, cent.cv) / (v.nrm * cent.cn) DESC, cent.cid
                       ) AS rn
                FROM v, cent
            ) WHERE rn = 1
        ), q AS (
            SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id < 5
        ), probes AS (
            SELECT query_id, qv, qn, cid FROM (
                SELECT q.query_id, q.qv, q.qn, cent.cid,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.qv, cent.cv) / (q.qn * cent.cn) DESC, cent.cid
                       ) AS rn
                FROM q, cent
            ) WHERE rn <= 2
        )
        SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
                   row_number() OVER (
                       PARTITION BY p.query_id
                       ORDER BY list_dot_product(p.qv, a.v) / (p.qn * a.nrm) DESC, a.vec_id
                   ) AS rn
            FROM assigned a JOIN probes p USING (cid)
            WHERE a.vec_id <> p.query_id
        ) WHERE rn <= 10
    """
    return sql
