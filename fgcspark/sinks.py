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
