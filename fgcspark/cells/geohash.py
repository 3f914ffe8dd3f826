"""Geohash cell encoding — the third cell family next to the s2lite
quadtree and the planar hex grid.

Standard public geohash (Niemeyer 2008): binary subdivision of the
WGS84 lon/lat box with bit interleaving (lon gets the even bit
positions starting at the MSB), base32-encoded 5 bits per character
with the alphabet 0123456789bcdefghjkmnpqrstuvwxyz. Unlike the metric
grids, geohash keys the GEODETIC coordinates — the standard join key
for web-scale geo datasets published in lat/lon.

Implementation is pure Catalyst arithmetic: quantize lon/lat to
integer cell indices (floor of the scaled offset — one double multiply
each, so the only fp-sensitivity is the same scale-multiply both
engines perform identically), interleave with an unrolled shift/mask
sum, then slice base32 characters out of a literal alphabet with
substring arithmetic. The identical expression is emitted as ANSI SQL
by geohash_sql, so the DuckDB oracle runs the same formula — divergence
surface is only the lon/lat inputs.

Precision p gives 5p bits: ceil(5p/2) for longitude, floor(5p/2) for
latitude. p=6 (~1.2 km x 0.6 km cells) is the default."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
DEFAULT_PRECISION = 6


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_bits(lon: Column, lat: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """The 5*precision interleaved bits as one BIGINT (precision <= 12)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    lon_bits, lat_bits = _bit_counts(precision)
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast(
        "long"
    )
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast(
        "long"
    )
    # clamp the closed upper boundary (lon=180 / lat=90) into the last cell
    ix = F.least(ix, F.lit((1 << lon_bits) - 1))
    iy = F.least(iy, F.lit((1 << lat_bits) - 1))
    total = lon_bits + lat_bits
    code = F.lit(0).cast("long")
    # bit j of ix (from MSB) lands at interleaved position 2j (MSB-first);
    # bit j of iy at position 2j+1
    for j in range(lon_bits):
        src = F.shiftright(ix, lon_bits - 1 - j).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(src, total - 1 - 2 * j)
    for j in range(lat_bits):
        src = F.shiftright(iy, lat_bits - 1 - j).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(src, total - 2 - 2 * j)
    return code


def geohash(lon: Column, lat: Column, precision: int = DEFAULT_PRECISION) -> Column:
    """The geohash string of (lon, lat) at the given precision."""
    code = geohash_bits(lon, lat, precision)
    chars = [
        F.substring(
            F.lit(BASE32),
            (F.shiftright(code, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lon_expr: str, lat_expr: str, precision: int = DEFAULT_PRECISION) -> str:
    """DuckDB/ANSI twin of geohash() — same quantization, same
    interleave arithmetic, same alphabet slicing."""
    lon_bits, lat_bits = _bit_counts(precision)
    ix = (
        f"least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {float(1 << lon_bits)!r}) AS BIGINT), "
        f"{(1 << lon_bits) - 1})"
    )
    iy = (
        f"least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {float(1 << lat_bits)!r}) AS BIGINT), "
        f"{(1 << lat_bits) - 1})"
    )
    total = lon_bits + lat_bits
    terms = []
    for j in range(lon_bits):
        terms.append(f"((({ix} >> {lon_bits - 1 - j}) & 1) << {total - 1 - 2 * j})")
    for j in range(lat_bits):
        terms.append(f"((({iy} >> {lat_bits - 1 - j}) & 1) << {total - 2 - 2 * j})")
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{BASE32}', CAST((({code} >> {5 * (precision - 1 - i)}) & 31) + 1 AS INT), 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"
