"""Web-Mercator slippy-tile / quadkey encoding — the geodetic web-map
cell family next to geohash (lat/lon binary subdivision) and the metric
s2lite/hex/km grids.

Standard public scheme (OSM slippy map tilenames; Bing Maps tile
system): project WGS84 onto the spherical-Mercator square, cut it into
2^z x 2^z tiles at zoom z, and name each tile either by (z, x, y) or by
the base-4 *quadkey* string whose i-th digit interleaves bit z-i of x
(low bit) with bit z-i of y (high bit) — so a quadkey prefix IS the
parent tile, which makes hierarchical rollups a `substring()` and
prefix-range scans contiguous.

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(lat') + 1/cos(lat')) / pi) / 2 * 2^z)
    lat' = radians(clamp(lat, +-85.05112878))

Implementation is pure Catalyst arithmetic — no UDF, whole-stage
codegen end to end. The identical expression (same literals, same
operator order) is emitted as ANSI SQL by quadkey_sql so the DuckDB
oracle runs the same formula; the only divergence surface is the
final-ulp of libm tan/cos/ln, which moves a point across a tile
boundary only if its image lies within 1 ulp of an integer — measure
zero for decimal-string inputs (same stance as cells/geohash.py, where
the sensitive op is the scale multiply).

Reference behavior: finbif-geo-convert aggregates occurrences onto the
Finnish 1/10/50/100 km grids (R/convert.R tile scheme); this module is
the web-Mercator analogue for the global lat/lon pages the graft adds
— z=12 tiles are ~10 km at the equator, matching the 10 km rung.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878  # Mercator square boundary (Bing tile system)
DEFAULT_ZOOM = 12
_PI = 3.141592653589793


def tile_xy(lon: Column, lat: Column, zoom: int = DEFAULT_ZOOM) -> tuple[Column, Column]:
    """Slippy tile indices (x, y) at the given zoom, as BIGINT columns."""
    if not 1 <= zoom <= 30:
        raise ValueError("zoom must be in 1..30")
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    latc = F.greatest(F.least(lat, F.lit(MAX_LAT)), F.lit(-MAX_LAT))
    rad = F.radians(latc)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    y = F.floor((F.lit(1.0) - merc / F.lit(_PI)) / F.lit(2.0) * F.lit(n)).cast("long")
    x = F.greatest(F.least(x, F.lit(hi)), F.lit(0))
    y = F.greatest(F.least(y, F.lit(hi)), F.lit(0))
    return x, y


def quadkey_from_xy(x: Column, y: Column, zoom: int) -> Column:
    """Base-4 quadkey string of tile (x, y): digit i (1-based from the
    left) is bit (zoom-i) of x plus twice bit (zoom-i) of y."""
    chars = []
    for i in range(1, zoom + 1):
        digit = (
            F.shiftright(x, zoom - i).bitwiseAND(F.lit(1))
            + F.shiftleft(F.shiftright(y, zoom - i).bitwiseAND(F.lit(1)), 1)
        )
        chars.append(F.substring(F.lit("0123"), (digit + 1).cast("int"), 1))
    return F.concat(*chars)


def quadkey(lon: Column, lat: Column, zoom: int = DEFAULT_ZOOM) -> Column:
    """The quadkey string of (lon, lat) at the given zoom."""
    x, y = tile_xy(lon, lat, zoom)
    return quadkey_from_xy(x, y, zoom)


def parent_key(qk: Column, zoom: int, steps: int = 1) -> Column:
    """Parent tile key at (zoom - steps) — quadkey prefixes ARE the
    hierarchy, so rollup is substring, no re-projection."""
    if steps >= zoom:
        raise ValueError("steps must be < zoom")
    return F.substring(qk, 1, zoom - steps)


# ---------------------------------------------------------------- python twin


def tile_xy_py(lon: float, lat: float, zoom: int) -> tuple[int, int]:
    """Driver-side scalar twin (same formula) for ring/bounds helpers
    and tests."""
    n = 1 << zoom
    x = int(math.floor((lon + 180.0) / 360.0 * float(n)))
    latc = max(min(lat, MAX_LAT), -MAX_LAT)
    rad = math.radians(latc)
    merc = math.log(math.tan(rad) + 1.0 / math.cos(rad))
    y = int(math.floor((1.0 - merc / _PI) / 2.0 * float(n)))
    return max(min(x, n - 1), 0), max(min(y, n - 1), 0)


def quadkey_py(lon: float, lat: float, zoom: int = DEFAULT_ZOOM) -> str:
    x, y = tile_xy_py(lon, lat, zoom)
    out = []
    for i in range(1, zoom + 1):
        out.append("0123"[((x >> (zoom - i)) & 1) + (((y >> (zoom - i)) & 1) << 1)])
    return "".join(out)


# ------------------------------------------------------------------ SQL twin


def quadkey_sql(lon_expr: str, lat_expr: str, zoom: int = DEFAULT_ZOOM) -> str:
    """DuckDB/ANSI twin of quadkey() — same clamp, same Mercator
    arithmetic (identical literals and operator order), same digit
    slicing."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    x = (
        f"greatest(least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {n!r}) AS BIGINT), "
        f"{hi}), 0)"
    )
    rad = f"radians(greatest(least({lat_expr}, {MAX_LAT!r}), {-MAX_LAT!r}))"
    merc = f"ln(tan({rad}) + 1.0 / cos({rad}))"
    y = (
        f"greatest(least(CAST(floor((1.0 - {merc} / {_PI!r}) / 2.0 * {n!r}) AS BIGINT), "
        f"{hi}), 0)"
    )
    chars = []
    for i in range(1, zoom + 1):
        digit = f"((({x} >> {zoom - i}) & 1) + ((({y} >> {zoom - i}) & 1) << 1))"
        chars.append(f"substring('0123', CAST({digit} + 1 AS INT), 1)")
    return "concat(" + ", ".join(chars) + ")"
