"""WKB (ISO well-known binary) codec for the engine's geometry model.

Public format (OGC 06-103r4 §8 / ISO 19125): little-endian encoding
with 2D coordinates. Round-trips every type in the engine's
vocabulary (SURVEY.md §1.2): POINT, MULTIPOINT, LINESTRING,
MULTILINESTRING, POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION, empties
(POINT EMPTY = NaN-NaN per the OGC convention; other empties = zero
element count).

Used by the GeoPackage sink (geometry BLOBs are a GP header + WKB)
and available as a compact BinaryType geometry column representation
for Spark tables (SURVEY.md §1.2 schema mapping note).
"""

from __future__ import annotations

import struct

import numpy as np

from fgcspark.geom.wkt import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

_CODE = {
    POINT: 1,
    LINESTRING: 2,
    POLYGON: 3,
    MULTIPOINT: 4,
    MULTILINESTRING: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}
_TYPE = {v: k for k, v in _CODE.items()}


def _pts(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype="<f8")
    return struct.pack("<I", len(a)) + a.tobytes()


def to_wkb(g: Geom) -> bytes:
    """Geom -> little-endian ISO WKB."""
    t = g.gtype
    if t not in _CODE:
        raise ValueError(f"no WKB code for geometry type {t}")
    head = struct.pack("<BI", 1, _CODE[t])
    if t == POINT:
        if g.is_empty:
            return head + struct.pack("<dd", float("nan"), float("nan"))
        return head + struct.pack("<dd", float(g.coords[0]), float(g.coords[1]))
    if t == LINESTRING:
        return head + _pts(g.coords if not g.is_empty else np.empty((0, 2)))
    if t == MULTIPOINT:
        pts = g.coords if not g.is_empty else np.empty((0, 2))
        body = struct.pack("<I", len(pts))
        for p in pts:
            body += to_wkb(Geom(POINT, np.asarray(p)))
        return head + body
    if t in (POLYGON, MULTILINESTRING):
        rings = g.coords or []
        body = struct.pack("<I", len(rings))
        for r in rings:
            body += _pts(r)
        return head + body
    if t == MULTIPOLYGON:
        parts = g.coords or []
        body = struct.pack("<I", len(parts))
        for rings in parts:
            body += to_wkb(Geom(POLYGON, rings))
        return head + body
    # GEOMETRYCOLLECTION
    members = g.coords or []
    body = struct.pack("<I", len(members))
    for m in members:
        body += to_wkb(m)
    return head + body


def _read_pts(buf: bytes, off: int, lt: str) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from(f"{lt}I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype=f"{lt}f8", count=2 * n, offset=off).reshape(n, 2)
    return arr.astype(np.float64), off + 16 * n


def _from_wkb(buf: bytes, off: int) -> tuple[Geom, int]:
    endian = buf[off]
    lt = "<" if endian == 1 else ">"
    (code,) = struct.unpack_from(f"{lt}I", buf, off + 1)
    off += 5
    t = _TYPE[code & 0xFF]  # mask off any Z/M/SRID flag bits
    if t == POINT:
        x, y = struct.unpack_from(f"{lt}dd", buf, off)
        off += 16
        if x != x and y != y:  # NaN-NaN = POINT EMPTY
            return Geom(POINT, None), off
        return Geom(POINT, np.array([x, y])), off
    if t == LINESTRING:
        arr, off = _read_pts(buf, off, lt)
        return Geom(LINESTRING, arr), off
    if t in (POLYGON, MULTILINESTRING):
        (n,) = struct.unpack_from(f"{lt}I", buf, off)
        off += 4
        rings = []
        for _ in range(n):
            r, off = _read_pts(buf, off, lt)
            rings.append(r)
        return Geom(t, rings), off
    if t == MULTIPOINT:
        (n,) = struct.unpack_from(f"{lt}I", buf, off)
        off += 4
        pts = []
        for _ in range(n):
            m, off = _from_wkb(buf, off)
            pts.append(m.coords if m.coords is not None else [np.nan, np.nan])
        return Geom(MULTIPOINT, np.array(pts).reshape(len(pts), 2)), off
    if t == MULTIPOLYGON:
        (n,) = struct.unpack_from(f"{lt}I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            m, off = _from_wkb(buf, off)
            parts.append(m.coords)
        return Geom(MULTIPOLYGON, parts), off
    (n,) = struct.unpack_from(f"{lt}I", buf, off)
    off += 4
    members = []
    for _ in range(n):
        m, off = _from_wkb(buf, off)
        members.append(m)
    return Geom(GEOMETRYCOLLECTION, members), off


def from_wkb(buf: bytes) -> Geom:
    """ISO WKB (either endianness) -> Geom."""
    g, _ = _from_wkb(buf, 0)
    return g
