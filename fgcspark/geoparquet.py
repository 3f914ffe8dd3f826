"""Distributed GeoParquet 1.1 sink — the data-scale geo output format.

The reference's outputs are single-machine downloads (GPKG / GeoJSON,
R/finbif_geo_convert.R:553-649; `sinks.py` mirrors those as
conversion-output writers). At 100 TB the right interchange format is
GeoParquet (OGC community standard): plain parquet whose geometry
column is WKB binary, self-described by a ``geo`` key in each file's
footer metadata (version, encoding, per-file bbox, geometry types,
CRS as PROJJSON). Every cloud geo engine reads it, and the per-file
bbox doubles as a spatial pruning index.

Spark's own parquet writer cannot attach custom footer key-values, so
the writer fans out via ``mapInPandas``: each task encodes its rows'
WKT to WKB with the engine's own codec (`geom/wkb.py`), tracks the
running bbox + geometry-type set, and writes ONE self-describing file
with pyarrow directly — no driver round-trip of data, no shuffle; the
only thing that returns to the driver is a one-row-per-file manifest
(path, rows, bbox, types), which also lands in ``_geo_manifest.json``
at the table root for O(files) spatial pruning without footer reads.
File names are keyed by partition id, so task retries overwrite their
own output (idempotent, speculative-execution safe).

Pair with the Z-order clustered layout (`cells/zorder.py`) upstream to
make the per-file bboxes tight — spatially clustered input partitions
give near-disjoint file bboxes, which is what makes bbox pruning
effective at scale.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from pyspark.sql import DataFrame

from fgcspark.geom.wkb import to_wkb
from fgcspark.geom.kernels import bbox as geom_bbox
from fgcspark.geom.wkt import parse_wkt

GEOPARQUET_VERSION = "1.1.0"

# engine gtype tags -> GeoParquet geometry_types names
_GP_TYPE = {
    "POINT": "Point",
    "MULTIPOINT": "MultiPoint",
    "LINESTRING": "LineString",
    "MULTILINESTRING": "MultiLineString",
    "POLYGON": "Polygon",
    "MULTIPOLYGON": "MultiPolygon",
    "GEOMETRYCOLLECTION": "GeometryCollection",
}

# Minimal PROJJSON (v0.7 schema) for ETRS-TM35FIN, from the public
# EPSG registry entry 3067 — the same constants crs/tm35fin.py projects
# with (GRS80, lon_0=27, k_0=0.9996, x_0=500000).
PROJJSON_EPSG_3067 = {
    "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
    "type": "ProjectedCRS",
    "name": "ETRS89 / TM35FIN(E,N)",
    "base_crs": {
        "type": "GeographicCRS",
        "name": "ETRS89",
        "datum": {
            "type": "GeodeticReferenceFrame",
            "name": "European Terrestrial Reference System 1989",
            "ellipsoid": {
                "name": "GRS 1980",
                "semi_major_axis": 6378137,
                "inverse_flattening": 298.257222101,
            },
        },
        "coordinate_system": {
            "subtype": "ellipsoidal",
            "axis": [
                {"name": "Latitude", "abbreviation": "lat", "direction": "north", "unit": "degree"},
                {"name": "Longitude", "abbreviation": "lon", "direction": "east", "unit": "degree"},
            ],
        },
        "id": {"authority": "EPSG", "code": 4258},
    },
    "conversion": {
        "name": "TM35FIN",
        "method": {"name": "Transverse Mercator", "id": {"authority": "EPSG", "code": 9807}},
        "parameters": [
            {"name": "Latitude of natural origin", "value": 0, "unit": "degree", "id": {"authority": "EPSG", "code": 8801}},
            {"name": "Longitude of natural origin", "value": 27, "unit": "degree", "id": {"authority": "EPSG", "code": 8802}},
            {"name": "Scale factor at natural origin", "value": 0.9996, "unit": "unity", "id": {"authority": "EPSG", "code": 8805}},
            {"name": "False easting", "value": 500000, "unit": "metre", "id": {"authority": "EPSG", "code": 8806}},
            {"name": "False northing", "value": 0, "unit": "metre", "id": {"authority": "EPSG", "code": 8807}},
        ],
    },
    "coordinate_system": {
        "subtype": "Cartesian",
        "axis": [
            {"name": "Easting", "abbreviation": "E", "direction": "east", "unit": "metre"},
            {"name": "Northing", "abbreviation": "N", "direction": "north", "unit": "metre"},
        ],
    },
    "id": {"authority": "EPSG", "code": 3067},
}


def _gp_normalize(g):
    """GeoParquet admits only the 7 core types; the engine's WKT model
    additionally passes through unknown tagged types with POLYGON-shaped
    nesting (TRIANGLE — reference test_pkg.R:91-95). Rewrite those to
    POLYGON structurally (a triangle IS its polygon), recursing into
    collections; core types pass through untouched."""
    from fgcspark.geom.wkt import GEOMETRYCOLLECTION, POLYGON, Geom

    if g.gtype == GEOMETRYCOLLECTION:
        members = [_gp_normalize(m) for m in g.coords]
        return Geom(GEOMETRYCOLLECTION, members)
    if g.gtype not in _GP_TYPE:
        return Geom(POLYGON, g.coords)
    return g


def _geo_meta(types: set[str], bb: list[float] | None, crs_epsg: int) -> bytes:
    col: dict = {"encoding": "WKB", "geometry_types": sorted(types)}
    if bb is not None:
        col["bbox"] = bb
    if crs_epsg == 3067:
        col["crs"] = PROJJSON_EPSG_3067
    elif crs_epsg != 4326:
        raise ValueError(f"unsupported crs_epsg {crs_epsg} (4326 or 3067)")
    # 4326 output is lon/lat degrees: GeoParquet's default CRS (OGC:CRS84)
    # — the spec says omit "crs" for the default.
    return json.dumps(
        {
            "version": GEOPARQUET_VERSION,
            "primary_column": "geometry",
            "columns": {"geometry": col},
        }
    ).encode()


MANIFEST_SCHEMA = (
    "path string, n_rows long, minx double, miny double, "
    "maxx double, maxy double, geometry_types array<string>"
)


def write_geoparquet(
    df: DataFrame,
    path: str,
    wkt_col: str = "geo_wkt",
    crs_epsg: int = 4326,
    compression: str = "zstd",
) -> dict:
    """Write ``df`` as a directory of GeoParquet 1.1 files (geometry =
    WKB column named ``geometry``; all other columns pass through).

    Returns the table-level manifest summary (also written to
    ``<path>/_geo_manifest.json``): total rows, union bbox, union
    geometry types, and the per-file entries.
    """
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    other = [c for c in df.columns if c != wkt_col]
    out_str = str(out)
    crs = int(crs_epsg)
    comp = compression

    def _write_part(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = []
        types: set[str] = set()
        bb = [math.inf, math.inf, -math.inf, -math.inf]
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            wkbs = []
            for s in pdf[wkt_col]:
                g = _gp_normalize(parse_wkt(s))
                wkbs.append(to_wkb(g))
                types.add(_GP_TYPE.get(g.gtype, g.gtype))
                b = geom_bbox(g)
                if b is not None:
                    bb[0] = min(bb[0], b[0])
                    bb[1] = min(bb[1], b[1])
                    bb[2] = max(bb[2], b[2])
                    bb[3] = max(bb[3], b[3])
            t = pa.Table.from_pandas(pdf[other], preserve_index=False)
            t = t.append_column("geometry", pa.array(wkbs, type=pa.binary()))
            tables.append(t)
            n += len(pdf)
        if n == 0:
            return
        table = pa.concat_tables(tables)
        fbb = bb if bb[0] <= bb[2] else None
        meta = dict(table.schema.metadata or {})
        meta[b"geo"] = _geo_meta(types, fbb, crs)
        table = table.replace_schema_metadata(meta)
        fpath = f"{out_str}/part-{pid:05d}.parquet"
        pq.write_table(table, fpath, compression=comp)
        yield pd.DataFrame(
            {
                "path": [fpath],
                "n_rows": [n],
                "minx": [fbb[0] if fbb else None],
                "miny": [fbb[1] if fbb else None],
                "maxx": [fbb[2] if fbb else None],
                "maxy": [fbb[3] if fbb else None],
                "geometry_types": [sorted(types)],
            }
        )

    files = [r.asDict() for r in df.mapInPandas(_write_part, MANIFEST_SCHEMA).collect()]
    # idempotent rewrite: a previous write with MORE partitions leaves
    # part files this run did not produce; a plain directory read would
    # return their rows while the manifest omits them. Remove every
    # part-*.parquet not in this run's manifest before committing it.
    produced = {Path(f["path"]).name for f in files}
    for stale in out.glob("part-*.parquet"):
        if stale.name not in produced:
            stale.unlink()
    xs = [f for f in files if f["minx"] is not None]
    summary = {
        "version": GEOPARQUET_VERSION,
        "crs_epsg": crs,
        "n_rows": sum(f["n_rows"] for f in files),
        "n_files": len(files),
        "bbox": [
            min(f["minx"] for f in xs),
            min(f["miny"] for f in xs),
            max(f["maxx"] for f in xs),
            max(f["maxy"] for f in xs),
        ]
        if xs
        else None,
        "geometry_types": sorted({t for f in files for t in f["geometry_types"]}),
        "files": sorted(files, key=lambda f: f["path"]),
    }
    (out / "_geo_manifest.json").write_text(json.dumps(summary, indent=1))
    return summary


def read_geoparquet(spark, path: str) -> DataFrame:
    """Read a GeoParquet directory back as a DataFrame (geometry stays
    WKB binary; decode with geom/wkb.from_wkb where needed)."""
    return spark.read.parquet(str(path))


def prune_files(path: str, minx: float, miny: float, maxx: float, maxy: float) -> list[str]:
    """O(files) spatial pruning from the table manifest: the files whose
    bbox intersects the query window — what a scan planner would feed
    to spark.read.parquet(*files) instead of the whole directory."""
    man = json.loads((Path(path) / "_geo_manifest.json").read_text())
    keep = []
    for f in man["files"]:
        if f["minx"] is None:
            continue
        if f["minx"] <= maxx and f["maxx"] >= minx and f["miny"] <= maxy and f["maxy"] >= miny:
            keep.append(f["path"])
    return keep


def file_geo_metadata(fpath: str) -> dict:
    """Parse the ``geo`` footer metadata of one GeoParquet file."""
    import pyarrow.parquet as pq

    md = pq.read_schema(fpath).metadata or {}
    return json.loads(md[b"geo"].decode())
