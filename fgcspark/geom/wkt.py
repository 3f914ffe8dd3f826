"""WKT parse/format and the engine's in-memory geometry model.

Re-expresses the reference's sf/WKT layer (reference
R/finbif_geo_convert.R:190,389-395 parse WKT with empty-geometry
defaults). Geometry vocabulary per SURVEY.md §1.2: POINT, MULTIPOINT,
LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON,
GEOMETRYCOLLECTION, empties, plus passthrough of unknown tagged types
(e.g. TRIANGLE — reference inst/tinytest/test_pkg.R:91-95).

Model (numpy-backed, used only inside Arrow-batched pandas UDFs):
  POINT                 coords = (2,) float array | None (empty)
  MULTIPOINT|LINESTRING coords = (k,2) array
  POLYGON|MULTILINESTRING coords = [ (k,2), ... ]   (polygon: rings)
  MULTIPOLYGON          coords = [ [ (k,2), ... ], ... ]
  GEOMETRYCOLLECTION    coords = [ Geom, ... ]
  <unknown tag>         treated like POLYGON-shaped nesting, tag kept
"""

from __future__ import annotations

import numpy as np

POINT = "POINT"
MULTIPOINT = "MULTIPOINT"
LINESTRING = "LINESTRING"
MULTILINESTRING = "MULTILINESTRING"
POLYGON = "POLYGON"
MULTIPOLYGON = "MULTIPOLYGON"
GEOMETRYCOLLECTION = "GEOMETRYCOLLECTION"

_KNOWN = {
    POINT,
    MULTIPOINT,
    LINESTRING,
    MULTILINESTRING,
    POLYGON,
    MULTIPOLYGON,
    GEOMETRYCOLLECTION,
}
# nesting depth of parenthesized coord lists per type
_DEPTH = {
    POINT: 0,
    MULTIPOINT: 1,
    LINESTRING: 1,
    MULTILINESTRING: 2,
    POLYGON: 2,
    MULTIPOLYGON: 3,
}


class Geom:
    __slots__ = ("gtype", "coords")

    def __init__(self, gtype: str, coords):
        self.gtype = gtype
        self.coords = coords

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Geom({to_wkt(self)})"

    @property
    def is_empty(self) -> bool:
        c = self.coords
        if c is None:
            return True
        if isinstance(c, np.ndarray):
            return c.size == 0
        return len(c) == 0


class WktError(ValueError):
    pass


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\n":
        i += 1
    return i


def _parse_body(s: str, i: int, depth: int):
    """Parse a parenthesized coordinate nest at given depth.

    depth 0 -> (x y); depth 1 -> (x y, x y, ...) with optional per-point
    parens (MULTIPOINT ((0 0), (1 1)) and MULTIPOINT (0 0, 1 1) both
    legal); depth>=2 -> nested lists.
    Returns (value, next_index)."""
    i = _skip_ws(s, i)
    if s[i] != "(":
        raise WktError(f"expected '(' at {i} in {s[:60]!r}")
    i += 1
    if depth == 0:
        j = s.index(")", i)
        xs = s[i:j].split()
        if len(xs) < 2:
            raise WktError(f"bad point at {i}")
        return np.array([float(xs[0]), float(xs[1])]), j + 1
    if depth == 1:
        pts = []
        while True:
            i = _skip_ws(s, i)
            if s[i] == "(":  # wrapped point
                p, i = _parse_body(s, i, 0)
                pts.append(p)
            else:
                j = i
                while s[j] not in ",)":
                    j += 1
                xs = s[i:j].split()
                pts.append(np.array([float(xs[0]), float(xs[1])]))
                i = j
            i = _skip_ws(s, i)
            if s[i] == ",":
                i += 1
                continue
            if s[i] == ")":
                return np.array(pts), i + 1
            raise WktError(f"unexpected {s[i]!r} at {i}")
    # depth >= 2
    items = []
    while True:
        item, i = _parse_body(s, i, depth - 1)
        items.append(item)
        i = _skip_ws(s, i)
        if s[i] == ",":
            i += 1
            continue
        if s[i] == ")":
            return items, i + 1
        raise WktError(f"unexpected {s[i]!r} at {i}")


def _parse_geom(s: str, i: int) -> tuple[Geom, int]:
    i = _skip_ws(s, i)
    j = i
    while j < len(s) and (s[j].isalpha() or s[j] == "_"):
        j += 1
    tag = s[i:j].upper()
    if not tag:
        raise WktError(f"expected geometry tag at {i} in {s[:60]!r}")
    i = _skip_ws(s, j)
    if s[i : i + 5] == "EMPTY":
        i += 5
        if tag == POINT:
            return Geom(POINT, None), i
        if tag in (MULTIPOINT, LINESTRING):
            return Geom(tag, np.empty((0, 2))), i
        return Geom(tag, []), i
    if tag == GEOMETRYCOLLECTION:
        if s[i] != "(":
            raise WktError(f"expected '(' at {i}")
        i += 1
        members = []
        while True:
            g, i = _parse_geom(s, i)
            members.append(g)
            i = _skip_ws(s, i)
            if s[i] == ",":
                i += 1
                continue
            if s[i] == ")":
                return Geom(GEOMETRYCOLLECTION, members), i + 1
            raise WktError(f"unexpected {s[i]!r} at {i}")
    depth = _DEPTH.get(tag, 2)  # unknown tags (TRIANGLE): polygon-shaped
    body, i = _parse_body(s, i, depth)
    return Geom(tag, body), i


def parse_wkt(s: str) -> Geom:
    g, i = _parse_geom(s, 0)
    if _skip_ws(s, i) != len(s):
        raise WktError(f"trailing data at {i} in {s[:60]!r}")
    return g


def _num(x: float) -> str:
    xi = int(x)
    if x == xi:
        return str(xi)
    return repr(float(x))


def _pts(arr: np.ndarray) -> str:
    return ", ".join(f"{_num(p[0])} {_num(p[1])}" for p in arr)


def to_wkt(g: Geom) -> str:
    t, c = g.gtype, g.coords
    if g.is_empty:
        return f"{t} EMPTY"
    if t == POINT:
        return f"POINT ({_num(c[0])} {_num(c[1])})"
    if t in (MULTIPOINT, LINESTRING):
        if t == MULTIPOINT:
            body = ", ".join(f"({_num(p[0])} {_num(p[1])})" for p in c)
        else:
            body = _pts(c)
        return f"{t} ({body})"
    if t in (POLYGON, MULTILINESTRING) or (t not in _KNOWN and t != GEOMETRYCOLLECTION):
        return f"{t} ({', '.join('(' + _pts(r) + ')' for r in c)})"
    if t == MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join("(" + _pts(r) + ")" for r in rings) + ")" for rings in c
        )
        return f"MULTIPOLYGON ({polys})"
    if t == GEOMETRYCOLLECTION:
        return f"GEOMETRYCOLLECTION ({', '.join(to_wkt(m) for m in c)})"
    raise WktError(f"cannot format {t}")
