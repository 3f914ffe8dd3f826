"""GeoParquet 1.1 sink: footer `geo` metadata per file, WKB round-trip
vs the source WKT, bbox correctness, manifest-based spatial pruning,
and idempotent per-partition file naming."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fgcspark.geom.wkb import from_wkb
from fgcspark.geom.wkt import parse_wkt, to_wkt
from fgcspark.geoparquet import (
    _gp_normalize,
    file_geo_metadata,
    prune_files,
    read_geoparquet,
    write_geoparquet,
)


@pytest.fixture(scope="module")
def geo_df(spark, pages_dir):
    from fgcspark.pipeline import geo_pipeline

    return (
        geo_pipeline(spark, pages_dir, geo="footprint", crs="wgs84")
        .select("url", "geo_wkt")
        .repartition(4, "url")
    )


def test_write_and_roundtrip(spark, geo_df, tmp_path):
    out = tmp_path / "gp"
    summary = write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")
    n = geo_df.count()
    assert summary["n_rows"] == n
    assert summary["n_files"] == 4
    assert (out / "_geo_manifest.json").exists()

    # every file self-describes per the spec
    for f in summary["files"]:
        meta = file_geo_metadata(f["path"])
        assert meta["version"] == "1.1.0"
        assert meta["primary_column"] == "geometry"
        gcol = meta["columns"]["geometry"]
        assert gcol["encoding"] == "WKB"
        assert gcol["geometry_types"] == f["geometry_types"]
        assert "crs" not in gcol  # 4326 output = spec default CRS84
        assert gcol["bbox"] == [f["minx"], f["miny"], f["maxx"], f["maxy"]]

    # WKB round-trips to the exact source WKT geometry
    back = read_geoparquet(spark, str(out))
    assert back.count() == n
    src = {r.url: r.geo_wkt for r in geo_df.collect()}
    # round-trips exactly, modulo the documented TRIANGLE->POLYGON
    # core-type normalization
    for r in back.collect():
        want = to_wkt(_gp_normalize(parse_wkt(src[r.url])))
        assert to_wkt(from_wkb(bytes(r.geometry))) == want


def test_bbox_covers_all_geometries(geo_df, tmp_path):
    from fgcspark.geom.kernels import bbox

    out = tmp_path / "gp2"
    summary = write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")
    bb = summary["bbox"]
    for r in geo_df.collect():
        b = bbox(parse_wkt(r.geo_wkt))
        if b is None:
            continue
        assert bb[0] <= b[0] and bb[1] <= b[1] and bb[2] >= b[2] and bb[3] >= b[3]


def test_prune_files_matches_brute_force(geo_df, tmp_path):
    out = tmp_path / "gp3"
    summary = write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")
    bb = summary["bbox"]
    # a quarter-window of the table extent
    win = (bb[0], bb[1], (bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2)
    kept = set(prune_files(str(out), *win))
    for f in summary["files"]:
        intersects = (
            f["minx"] is not None
            and f["minx"] <= win[2]
            and f["maxx"] >= win[0]
            and f["miny"] <= win[3]
            and f["maxy"] >= win[1]
        )
        assert (f["path"] in kept) == intersects
    assert kept  # window overlaps the table, something must survive


def test_crs_3067_projjson(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "POINT (500000 6700000)"), ("b", "POINT (400000 7000000)")],
        "url string, geo_wkt string",
    ).coalesce(1)
    summary = write_geoparquet(df, str(tmp_path / "gp67"), crs_epsg=3067)
    meta = file_geo_metadata(summary["files"][0]["path"])
    crs = meta["columns"]["geometry"]["crs"]
    assert crs["id"] == {"authority": "EPSG", "code": 3067}
    assert crs["conversion"]["method"]["id"]["code"] == 9807
    assert summary["geometry_types"] == ["Point"]


def test_rewrite_is_idempotent(spark, geo_df, tmp_path):
    out = tmp_path / "gp4"
    s1 = write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")
    s2 = write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")
    assert [f["path"] for f in s1["files"]] == [f["path"] for f in s2["files"]]
    assert read_geoparquet(spark, str(out)).count() == s1["n_rows"]


def test_rewrite_with_fewer_partitions_removes_stale_parts(spark, geo_df, tmp_path):
    """Rewriting into the same directory with FEWER partitions must not
    leave stale part files behind: a plain directory read would return
    their rows while the manifest omits them (silent wrong rows)."""
    out = tmp_path / "gp5"
    write_geoparquet(geo_df, str(out), wkt_col="geo_wkt")  # 4 partitions
    s2 = write_geoparquet(
        geo_df.coalesce(1), str(out), wkt_col="geo_wkt"
    )
    on_disk = sorted(p.name for p in out.glob("part-*.parquet"))
    in_manifest = sorted(f["path"].rsplit("/", 1)[-1] for f in s2["files"])
    assert on_disk == in_manifest
    assert read_geoparquet(spark, str(out)).count() == s2["n_rows"]


def test_unsupported_crs_rejected(spark, tmp_path):
    df = spark.createDataFrame([("a", "POINT (0 0)")], "url string, geo_wkt string")
    with pytest.raises(Exception):
        write_geoparquet(df, str(tmp_path / "bad"), crs_epsg=2393)


def test_zorder_layout_tightens_pruning(spark, pages_dir, tmp_path):
    """The documented pairing: Z-order-clustered partitions give
    near-disjoint per-file bboxes, so manifest pruning keeps fewer
    files for a window query than a spatially-random layout."""
    from fgcspark.cells.zorder import zorder_key
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, pages_dir).select(
        "url", F.concat(F.lit("POINT ("), F.col("plon"), F.lit(" "), F.col("plat"), F.lit(")")).alias("geo_wkt"),
        "e", "n",
    )
    n_files = 8
    rand = pts.select("url", "geo_wkt").repartition(n_files, "url")
    zord = (
        pts.withColumn("_z", zorder_key(F.col("e"), F.col("n")))
        .repartitionByRange(n_files, "_z")
        .select("url", "geo_wkt")
    )
    s_rand = write_geoparquet(rand, str(tmp_path / "rand"), wkt_col="geo_wkt")
    s_zord = write_geoparquet(zord, str(tmp_path / "zord"), wkt_col="geo_wkt")
    assert s_rand["n_rows"] == s_zord["n_rows"]
    bb = s_zord["bbox"]
    # an eighth-of-extent window
    win = (
        bb[0],
        bb[1],
        bb[0] + (bb[2] - bb[0]) / 4,
        bb[1] + (bb[3] - bb[1]) / 2,
    )
    kept_rand = len(prune_files(str(tmp_path / "rand"), *win))
    kept_zord = len(prune_files(str(tmp_path / "zord"), *win))
    # random layout: every file spans the whole extent -> nothing prunes
    assert kept_rand == n_files
    assert kept_zord < n_files  # clustering makes the manifest selective
