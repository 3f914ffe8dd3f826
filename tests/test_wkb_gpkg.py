"""WKB codec round-trip + GeoPackage sink structural checks."""

import sqlite3
import struct

import numpy as np
import pytest

from fgcspark.geom.wkb import from_wkb, to_wkb
from fgcspark.geom.wkt import parse_wkt, to_wkt
from fgcspark.sinks import gpkg_geometry_blob, write_gpkg

WKTS = [
    "POINT (24.5 60.5)",
    "POINT EMPTY",
    "MULTIPOINT ((1 2), (3 4))",
    "LINESTRING (0 0, 1 1, 2 0)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "POLYGON EMPTY",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_wkb_roundtrip(wkt):
    g = parse_wkt(wkt)
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == to_wkt(g)


def test_wkb_point_is_iso_standard():
    # byte-exact against the public ISO layout: 01 01000000 x y
    buf = to_wkb(parse_wkt("POINT (2 3)"))
    assert buf == b"\x01\x01\x00\x00\x00" + struct.pack("<dd", 2.0, 3.0)


def test_gpkg_blob_header():
    blob = gpkg_geometry_blob(parse_wkt("POINT (1 1)"), 4326)
    assert blob[:2] == b"GP" and blob[2] == 0
    assert struct.unpack("<i", blob[4:8])[0] == 4326
    assert blob[8:9] == b"\x01"  # WKB little-endian marker


def test_write_gpkg_structure(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("POINT", "POINT (24.5 60.5)", "a"),
            ("POINT", "POINT (25.0 61.0)", "b"),
            ("MULTIPOLYGON", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))", "c"),
        ],
        "geom_type string, geo_wkt string, name string",
    )
    path = tmp_path / "out.gpkg"
    layers = write_gpkg(df, str(path), "HBF.90001")
    assert set(layers) == {"HBF_90001_point", "HBF_90001_polygon"}

    con = sqlite3.connect(path)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47  # "GPKG"
        contents = dict(
            con.execute("SELECT table_name, data_type FROM gpkg_contents").fetchall()
        )
        assert contents == {
            "HBF_90001_point": "features",
            "HBF_90001_polygon": "features",
        }
        srs = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
        assert {4326, 3067, 0, -1} <= srs
        geom_cols = con.execute(
            "SELECT table_name, column_name, geometry_type_name, srs_id "
            "FROM gpkg_geometry_columns ORDER BY 1"
        ).fetchall()
        assert geom_cols[0] == ("HBF_90001_point", "geom", "POINT", 4326)
        # feature rows decode back to the input WKT through our codec
        blob, nm = con.execute(
            'SELECT geom, name FROM "HBF_90001_point" ORDER BY fid'
        ).fetchone()
        assert nm == "a"
        from fgcspark.geom.wkb import from_wkb

        assert to_wkt(from_wkb(bytes(blob)[8:])) == "POINT (24.5 60.5)"
        # bbox recorded
        mnx, mny, mxx, mxy = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents "
            "WHERE table_name='HBF_90001_point'"
        ).fetchone()
        assert (mnx, mny, mxx, mxy) == (24.5, 60.5, 25.0, 61.0)
    finally:
        con.close()
