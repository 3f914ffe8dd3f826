"""Spatial-join goldens: PIP and kNN vs the generator's brute-force
oracles (FIXTURES.md §6), plus an in-test brute-force cross-check that
is independent of the generator code path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.joins.knn import knn_join, knn_join_partitioned
from fgcspark.joins.pip import build_polygon_index, pip_join
from fgcspark.pipeline import pages_to_points


@pytest.fixture(scope="module")
def points(spark, pages_dir):
    return pages_to_points(spark, pages_dir).select("url", "e", "n").cache()


def test_pip_matches_golden(spark, pages_dir, points):
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    got = (
        pip_join(spark, points, polys)
        .toPandas()
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{pages_dir}/pip.parquet")
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_pip_refine_backends_bit_identical(spark, pages_dir, points):
    """The JVM-expression refine and the Arrow/numpy refine evaluate
    the same crossing formula in the same operation order — their
    outputs must be IDENTICAL row sets (not just close)."""
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    key = lambda d: sorted(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    a = pip_join(spark, points, polys, refine="expr").toPandas()
    b = pip_join(spark, points, polys, refine="pandas").toPandas()
    assert key(a) == key(b)


def test_pip_cell_prefilter_is_lossless(spark, pages_dir, points):
    # a coarser prefilter grid must give identical results
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    a = pip_join(spark, points, polys, cell_km=50).toPandas()
    b = pip_join(spark, points, polys, cell_km=100).toPandas()
    key = lambda d: set(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    assert key(a) == key(b)


def test_pip_index_cover_contains_bbox(spark, pages_dir):
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    idx = build_polygon_index(spark, polys, cell_km=50)
    cover = set(idx.cover())
    s = 50 * 1000
    for pid, (x0, y0, x1, y1) in zip(idx.poly_ids, idx.bboxes):
        for corner in ((x0, y0), (x1, y1)):
            cell = (int(np.floor(corner[1] / s)), int(np.floor(corner[0] / s)), int(pid))
            assert cell in cover


def test_knn_matches_golden(spark, pages_dir, points):
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    got = knn_join(spark, points, probes, k=5)
    got_pd = got.toPandas()
    want = pd.read_parquet(f"{pages_dir}/knn.parquet")
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    assert key(got_pd) == key(want)
    assert len(got_pd) == len(want)  # exactly k rows per probe


def test_knn_distances_certified(spark, pages_dir, points):
    # independent check: engine's k-th distance equals the true k-th
    # distance from a full scan (done here in pandas, not the generator)
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet").limit(10)
    got = knn_join(spark, points, probes, k=5).toPandas()
    pts = points.toPandas()
    from fgcspark.crs import tm35fin as tm

    pr = probes.toPandas()
    pe, pn = tm.geodetic_to_tm35(pr["lon"].to_numpy(), pr["lat"].to_numpy())
    for i, pid in enumerate(pr["probe_id"]):
        d = np.hypot(pts["e"].to_numpy() - pe[i], pts["n"].to_numpy() - pn[i])
        true_k = np.sort(d)[4]
        eng_k = got[got["probe_id"] == pid]["dist"].max()
        assert eng_k == pytest.approx(true_k, abs=1e-6)


def test_knn_partitioned_matches_golden(spark, pages_dir, points):
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    got = knn_join_partitioned(spark, points, probes, k=5).toPandas()
    want = pd.read_parquet(f"{pages_dir}/knn.parquet")
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    assert key(got) == key(want)
    assert len(got) == len(want)


def test_knn_partitioned_multi_ring_matches_driver_path(spark, pages_dir, points):
    # tiny cells force several frontier rounds; result must equal the
    # collected-probe implementation row-for-row (same tie rules)
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet").limit(20)
    a = knn_join_partitioned(spark, points, probes, k=3, cell_km=10).toPandas()
    b = knn_join(spark, points, probes, k=3, cell_km=10).toPandas()
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    assert key(a) == key(b)
    assert len(a) == len(b)


def test_knn_small_cells_still_exact(spark, pages_dir, points):
    # force multi-ring expansion with a tiny cell size
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet").limit(5)
    a = knn_join(spark, points, probes, k=3, cell_km=10).toPandas()
    b = knn_join(spark, points, probes, k=3, cell_km=100).toPandas()
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    assert key(a) == key(b)


def test_embed_neardup_vec_equals_hof(spark):
    """The vectorized near-dup kernel must reproduce the JVM
    higher-order-function fold EXACTLY (same left-fold float order) —
    row-identical output, not approximately equal."""
    from fgcspark.sim import embedding_neardup_pairs, embedding_neardup_pairs_vec

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = set(map(tuple, embedding_neardup_pairs(df, tau=0.4).collect()))
    b = set(map(tuple, embedding_neardup_pairs_vec(df, tau=0.4).collect()))
    assert a == b and len(a) > 0


def test_pip_partitioned_matches_broadcast_path(spark, pages_dir, points):
    from fgcspark.joins.pip import pip_join_partitioned

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    a = pip_join(spark, points, polys).toPandas()
    b = pip_join_partitioned(spark, points, polys).toPandas()
    key = lambda d: set(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    assert key(a) == key(b) and len(a) == len(b)


def test_pip_partitioned_hot_cell_salting(spark, pages_dir, points):
    """Skewed layer: every point squeezed into ONE 50 km cell (>=20%
    of points in a single cell by construction — here 100%). With
    max_cell_points=200 the hot cell must be sub-split so no cogroup
    task sees more than ~200 points, and the output must stay
    identical to the unsalted/broadcast answer."""
    from fgcspark.joins.pip import hot_cell_factors, pip_join_partitioned

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    # collapse all points into the cell of the first point: keep keys
    # and per-point identity, lose spatial spread -> maximal skew
    first = points.limit(1).collect()[0]
    e0, n0 = float(first["e"]), float(first["n"])
    s = 50 * 1000
    skew = points.select(
        "url",
        (F.lit(np.floor(e0 / s) * s) + F.pmod(F.xxhash64("url"), F.lit(int(s)))).alias("e"),
        (F.lit(np.floor(n0 / s) * s) + F.pmod(F.xxhash64("url", F.lit(1)), F.lit(int(s)))).alias("n"),
    )
    n_total = skew.count()

    # the factor table must cover the hot cell with m ~ n/200
    pts_cells = skew.select(
        "url", "e", "n",
        F.floor(F.col("n") / s).cast("long").alias("cell_n"),
        F.floor(F.col("e") / s).cast("long").alias("cell_e"),
    )
    factors = hot_cell_factors(spark, pts_cells, max_cell_points=200)
    assert factors is not None
    frows = factors.collect()
    assert len(frows) == 1 and frows[0]["m"] == int(np.ceil(n_total / 200))

    # per-task input bound: group sizes under the engine's own salt
    # assignment never exceed ~max_cell_points (hash imbalance margin)
    m = frows[0]["m"]
    sizes = (
        pts_cells.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(m)).cast("int"))
        .groupBy("cell_n", "cell_e", "salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.count(F.lit(1)).alias("groups"))
        .collect()[0]
    )
    assert sizes["groups"] == m
    assert sizes["mx"] <= 2 * 200

    a = pip_join(spark, skew, polys).toPandas()
    b = pip_join_partitioned(spark, skew, polys, max_cell_points=200).toPandas()
    key = lambda d: set(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    assert key(a) == key(b) and len(a) == len(b)


# ---------------------------------------------------------------------------
# footprint x layer intersects join
# ---------------------------------------------------------------------------


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_geom_intersects_rings_cases():
    from fgcspark.joins.fpjoin import geom_intersects_rings as gi

    poly = [_sq(0, 0, 10, 10), _sq(4, 4, 6, 6)]  # square with a hole
    # point inside / in hole / outside
    assert gi([("pt", np.array([[1.0, 1.0]]))], poly)
    assert not gi([("pt", np.array([[5.0, 5.0]]))], poly)  # hole interior
    assert not gi([("pt", np.array([[20.0, 1.0]]))], poly)
    # line crossing the boundary; line wholly inside; line in the hole
    assert gi([("line", np.array([[-2.0, 5.0], [2.0, 5.0]]))], poly)
    assert gi([("line", np.array([[1.0, 1.0], [2.0, 2.0]]))], poly)
    assert not gi([("line", np.array([[4.5, 5.0], [5.5, 5.0]]))], poly)
    # polygon crossing; polygon containing the layer polygon; contained
    assert gi([("poly", [_sq(8, 8, 12, 12)])], poly)
    assert gi([("poly", [_sq(-5, -5, 15, 15)])], poly)
    assert gi([("poly", [_sq(1, 1, 2, 2)])], poly)
    # polygon entirely within the hole; disjoint polygon
    assert not gi([("poly", [_sq(4.5, 4.5, 5.5, 5.5)])], poly)
    assert not gi([("poly", [_sq(20, 20, 30, 30)])], poly)
    # footprint polygon that contains the hole ring but crosses nothing:
    # its vertices are in the hole (outside), yet the ring area between
    # hole and its own boundary... pick one overlapping the annulus
    assert gi([("poly", [_sq(3, 3, 7, 7)])], poly)


def test_segs_touch_is_intersecting():
    from fgcspark.joins.fpjoin import _segs_any_intersect

    A = np.array([[0.0, 0.0, 1.0, 0.0]])
    assert _segs_any_intersect(A, np.array([[0.5, 0.0, 0.5, 1.0]]))  # T touch
    assert _segs_any_intersect(A, np.array([[0.5, 0.0, 2.0, 0.0]]))  # collinear
    assert not _segs_any_intersect(A, np.array([[0.0, 0.5, 1.0, 0.5]]))


def test_fp_join_matches_golden(spark, pages_dir):
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir))
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    got = (
        footprint_join(spark, pages, polys)
        .toPandas()
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{pages_dir}/fpjoin.parquet")
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_fp_partitioned_matches_golden_and_broadcast(spark, pages_dir):
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join_partitioned
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir))
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    got = (
        footprint_join_partitioned(spark, pages, polys)
        .toPandas()
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{pages_dir}/fpjoin.parquet")
        .sort_values(["url", "poly_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_fp_partitioned_hot_cell_split_is_exact(spark, pages_dir):
    # a tiny threshold forces every cell through the salted sub-split;
    # the pair set must not change
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join_partitioned
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir)).limit(400)
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    key = lambda d: sorted(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    a = footprint_join_partitioned(spark, pages, polys).toPandas()
    b = footprint_join_partitioned(spark, pages, polys, max_cell_rows=5).toPandas()
    assert key(a) == key(b)


def test_fp_refine_backends_bit_identical(spark, pages_dir):
    """The nested-lambda expression refine and the WKB/numpy refine
    evaluate identical float predicates — identical row sets."""
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir))
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    key = lambda d: sorted(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    a = footprint_join(spark, pages, polys, refine="expr").toPandas()
    b = footprint_join(spark, pages, polys, refine="pandas").toPandas()
    assert key(a) == key(b)


def test_fp_join_prefilter_is_lossless(spark, pages_dir):
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir))
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    key = lambda d: set(map(tuple, d[["url", "poly_id"]].itertuples(index=False)))
    a = footprint_join(spark, pages, polys, cell_km=50).toPandas()
    b = footprint_join(spark, pages, polys, cell_km=100).toPandas()
    assert key(a) == key(b)


def test_fp_join_plan_has_no_shuffle(spark, pages_dir):
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir))
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    plan = (
        footprint_join(spark, pages, polys)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # broadcast join + arithmetic reporting-cell dedup: the probe side
    # must stream with no exchange anywhere
    assert "Exchange" not in plan or "BroadcastExchange" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def test_pip_anti_join_is_exact_complement(spark, pages_dir, points):
    """pip_anti_join returns exactly the points pip_join never emits,
    and together they partition the input key set."""
    from fgcspark.joins.pip import pip_anti_join

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    outside = {r.url for r in pip_anti_join(spark, points, polys).collect()}
    inside = {r.url for r in pip_join(spark, points, polys).select("url").collect()}
    every = {r.url for r in points.select("url").collect()}
    assert outside == every - inside
    assert outside  # the synth layer leaves some pages uncovered
    assert outside.isdisjoint(inside)
