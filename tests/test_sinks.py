"""GeoJSON layered sink (fgcspark/sinks.py) — the S4 golden writer.

Layer naming and layer-per-type splitting follow the reference
(R/finbif_geo_convert.R:586-630); geometry rendering is validated by
round-tripping the written JSON."""

from __future__ import annotations

import json

import pytest

from fgcspark.sinks import geojson_geometry, layer_name, write_geojson_layers
from fgcspark.geom.wkt import parse_wkt


def test_layer_name_reference_rules():
    # dots -> underscores; lower-case; multi prefix stripped (:596-599,624)
    assert layer_name("HBF.53254_geo", "MULTIPOLYGON") == "HBF_53254_geo_polygon"
    assert layer_name("laji-data", "POINT") == "laji-data_point"
    assert layer_name("x", "MULTIPOINT") == "x_point"
    assert layer_name("x", "GEOMETRYCOLLECTION") == "x_geometrycollection"


def test_geojson_geometry_shapes():
    g = geojson_geometry(parse_wkt("POINT (1 2)"))
    assert g == {"type": "Point", "coordinates": [1.0, 2.0]}
    g = geojson_geometry(parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"))
    assert g["type"] == "MultiPolygon"
    assert g["coordinates"][0][0][1] == [1.0, 0.0]
    g = geojson_geometry(parse_wkt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"))
    assert [m["type"] for m in g["geometries"]] == ["Point", "LineString"]
    assert geojson_geometry(parse_wkt("POLYGON EMPTY")) == {
        "type": "Polygon",
        "coordinates": [],
    }


def test_write_geojson_layers_end_to_end(spark, pages_dir, tmp_path):
    from fgcspark.pipeline import geo_pipeline

    df = geo_pipeline(spark, pages_dir, geo="footprint", crs="wgs84").select(
        "url", "geo_wkt", "geom_type"
    )
    paths = write_geojson_layers(df, str(tmp_path), "pages_geo")
    # every geometry type present in the table got its own layer file
    types = {r["geom_type"] for r in df.select("geom_type").distinct().collect()}
    assert set(paths) == {layer_name("pages_geo", t) for t in types}
    total = 0
    for p in paths.values():
        fc = json.loads(open(p).read())
        assert fc["type"] == "FeatureCollection"
        assert all(f["properties"]["url"] for f in fc["features"])
        total += len(fc["features"])
    assert total == df.count()


def test_golden_writer_refuses_truncation(spark, pages_dir, tmp_path):
    from fgcspark.pipeline import geo_pipeline

    df = geo_pipeline(spark, pages_dir, geo="point", crs="wgs84").select(
        "url", "geo_wkt", "geom_type"
    )
    with pytest.raises(ValueError, match="golden writer"):
        write_geojson_layers(df, str(tmp_path), "x", max_rows=10)
