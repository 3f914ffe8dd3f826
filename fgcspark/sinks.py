"""Geo sinks: layered GeoJSON golden writer + the partitioned parquet
layer sink.

Re-expresses the reference's GeoPackage output (S4: one GPKG layer per
geometry type, layer named `{basename_with_underscores}_{type}` with
the type lower-cased and the `multi` prefix stripped — reference
R/finbif_geo_convert.R:586-630). GDAL is unavailable in this container,
so the interchange format is GeoJSON (a GDAL-readable sibling); at
scale the sink is `pipeline.write_layered` (partitionBy geometry type,
pure parquet) and this writer renders small golden extracts
driver-side, exactly as the reference's tinytest fixtures are small.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame

from fgcspark.geom.wkt import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    parse_wkt,
)

_GJ_TYPE = {
    POINT: "Point",
    MULTIPOINT: "MultiPoint",
    LINESTRING: "LineString",
    MULTILINESTRING: "MultiLineString",
    POLYGON: "Polygon",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}


def _coords(obj):
    if isinstance(obj, np.ndarray):
        if obj.ndim == 1:
            return [float(obj[0]), float(obj[1])]
        return [[float(x), float(y)] for x, y in obj]
    return [_coords(c) for c in obj]


def geojson_geometry(g: Geom) -> dict:
    """Geom -> GeoJSON geometry dict (empty geometries get empty
    coordinate arrays, matching GDAL's GeoJSON rendering)."""
    if g.gtype == GEOMETRYCOLLECTION:
        return {
            "type": "GeometryCollection",
            "geometries": [geojson_geometry(m) for m in (g.coords or [])],
        }
    # unknown tagged types (e.g. TRIANGLE passthrough, reference
    # test_pkg.R:91-95) are polygon-shaped in the model; GDAL likewise
    # renders Triangle/TIN as Polygon when writing GeoJSON
    t = _GJ_TYPE.get(g.gtype, "Polygon")
    if g.is_empty:
        return {"type": t, "coordinates": [] if g.gtype != POINT else []}
    return {"type": t, "coordinates": _coords(g.coords)}


def _json_prop(v):
    """GeoJSON property coercion: timestamps -> ISO strings, raw bytes
    -> hex (GDAL renders GPKG BLOB columns the same way)."""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def layer_name(basename: str, gtype: str) -> str:
    """Reference layer naming (R/finbif_geo_convert.R:596-599,624):
    dots -> underscores in the basename; type lower-cased with the
    `multi` prefix stripped."""
    base = re.sub(r"\.", "_", basename)
    t = re.sub(r"^multi", "", gtype.lower())
    return f"{base}_{t}"


def write_geojson_layers(
    df: DataFrame,
    out_dir: str,
    basename: str,
    wkt_col: str = "geo_wkt",
    type_col: str = "geom_type",
    max_rows: int = 100_000,
) -> dict[str, str]:
    """Write one GeoJSON FeatureCollection file per geometry type.

    Driver-side by design: golden/interchange extracts are small (the
    reference's own outputs are single-machine GPKGs). The guard
    refuses silently-truncated output; at data scale use
    `pipeline.write_layered` instead. Returns {layer_name: path}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    prop_cols = [c for c in df.columns if c not in (wkt_col, type_col)]
    rows = df.select(type_col, wkt_col, *prop_cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_geojson_layers is a golden writer (> {max_rows} rows); "
            "use pipeline.write_layered for data-scale output"
        )
    layers: dict[str, list] = {}
    for r in rows:
        feat = {
            "type": "Feature",
            "geometry": geojson_geometry(parse_wkt(r[wkt_col])),
            "properties": {c: _json_prop(r[c]) for c in prop_cols},
        }
        layers.setdefault(r[type_col], []).append(feat)
    paths: dict[str, str] = {}
    for gtype, feats in sorted(layers.items()):
        name = layer_name(basename, gtype)
        p = out / f"{name}.geojson"
        p.write_text(
            json.dumps(
                {"type": "FeatureCollection", "name": name, "features": feats},
                separators=(",", ":"),
            )
        )
        paths[name] = str(p)
    return paths


# ---------------------------------------------------------------------------
# GeoPackage sink (S4's native format) — stdlib sqlite3 + own WKB codec
# ---------------------------------------------------------------------------

_GPKG_APPLICATION_ID = 0x47504B47  # "GPKG"
_GPKG_USER_VERSION = 10200  # GeoPackage 1.2

# public EPSG registry definitions (minimal OGC WKT1)
_SRS_ROWS = [
    (
        "WGS 84", 4326, "EPSG", 4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
        None,
    ),
    (
        "ETRS89 / TM35FIN(E,N)", 3067, "EPSG", 3067,
        'PROJCS["ETRS89 / TM35FIN(E,N)",GEOGCS["ETRS89",DATUM["European_'
        'Terrestrial_Reference_System_1989",SPHEROID["GRS 1980",6378137,'
        '298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",'
        '0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",27],'
        'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]',
        None,
    ),
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", "undefined cartesian"),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", "undefined geographic"),
]


def gpkg_geometry_blob(g: Geom, srs_id: int) -> bytes:
    """GeoPackage geometry BLOB (spec §2.1.3): 'GP' magic, version 0,
    flags (little-endian, no envelope), srs_id, then ISO WKB."""
    import struct

    from fgcspark.geom.wkb import to_wkb

    flags = 0b00000001  # byte order 1 (LE), envelope indicator 0
    if g.is_empty:
        flags |= 0b00010000  # empty geometry flag
    return b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id) + to_wkb(g)


def write_gpkg(
    df: DataFrame,
    path: str,
    basename: str,
    wkt_col: str = "geo_wkt",
    type_col: str = "geom_type",
    srs_id: int = 4326,
    max_rows: int = 100_000,
) -> dict[str, str]:
    """S4 in its native format: ONE GeoPackage file, one layer per
    geometry type, layers named by the reference's rules
    (R/finbif_geo_convert.R:586-630). Pure stdlib sqlite3 + the
    engine's own WKB codec — no GDAL in-container.

    Driver-side by design, like write_geojson_layers: a conversion's
    output is one user download (the reference writes single-machine
    GPKGs); data-scale output is pipeline.write_layered. Returns
    {layer_name: gpkg_table_name}."""
    import sqlite3

    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists():
        out.unlink()
    prop_cols = [c for c in df.columns if c not in (wkt_col, type_col)]
    rows = df.select(type_col, wkt_col, *prop_cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_gpkg is a conversion-output writer (> {max_rows} rows); "
            "use pipeline.write_layered for data-scale output"
        )

    con = sqlite3.connect(out)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APPLICATION_ID}")
        con.execute(f"PRAGMA user_version = {_GPKG_USER_VERSION}")
        con.execute(
            """CREATE TABLE gpkg_spatial_ref_sys (
                srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
                organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
                definition TEXT NOT NULL, description TEXT)"""
        )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", _SRS_ROWS
        )
        con.execute(
            """CREATE TABLE gpkg_contents (
                table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
                identifier TEXT UNIQUE, description TEXT DEFAULT '',
                last_change DATETIME NOT NULL DEFAULT
                    (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
                min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
                srs_id INTEGER,
                CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)
                    REFERENCES gpkg_spatial_ref_sys(srs_id))"""
        )
        con.execute(
            """CREATE TABLE gpkg_geometry_columns (
                table_name TEXT NOT NULL, column_name TEXT NOT NULL,
                geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
                z TINYINT NOT NULL, m TINYINT NOT NULL,
                CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
        )

        layers: dict[str, list] = {}
        for r in rows:
            layers.setdefault(r[type_col], []).append(r)
        result: dict[str, str] = {}
        for gtype, feats in sorted(layers.items()):
            name = layer_name(basename, gtype)
            col_defs = ", ".join(f'"{c}" TEXT' for c in prop_cols)
            con.execute(
                f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
                f"geom BLOB{', ' + col_defs if col_defs else ''})"
            )
            xs, ys = [], []
            for r in feats:
                g = parse_wkt(r[wkt_col])
                blob = gpkg_geometry_blob(g, srs_id)
                con.execute(
                    f'INSERT INTO "{name}" (geom{"".join("," + chr(34) + c + chr(34) for c in prop_cols)}) '
                    f"VALUES (?{',?' * len(prop_cols)})",
                    (blob, *[None if r[c] is None else str(r[c]) for c in prop_cols]),
                )
                for ring in _wkt_coords_flat(g):
                    xs.extend(ring[:, 0].tolist())
                    ys.extend(ring[:, 1].tolist())
            bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (None,) * 4
            con.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
                "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
                (name, "features", name, *bbox, srs_id),
            )
            con.execute(
                "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (name, "geom", gtype.upper(), srs_id),
            )
            result[name] = name
        con.commit()
    finally:
        con.close()
    return result


def _wkt_coords_flat(g: Geom):
    """All coordinate arrays of a geometry, flattened for bbox use."""
    c = g.coords
    if c is None:
        return
    if isinstance(c, np.ndarray):
        yield c.reshape(-1, 2)
        return
    for item in c:
        if isinstance(item, Geom):
            yield from _wkt_coords_flat(item)
        elif isinstance(item, np.ndarray):
            yield item.reshape(-1, 2)
        else:  # multipolygon: list of rings
            for ring in item:
                yield ring.reshape(-1, 2)
