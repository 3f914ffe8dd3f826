"""Convex hull kernel: the three defining properties (convex, contains
every input vertex, hull vertices are input vertices), degenerate
cases, and the forward layer golden."""

import numpy as np
import pytest

from fgcspark.geom import kernels as K
from fgcspark.geom.wkt import Geom, parse_wkt, to_wkt


def _is_ccw_convex(ring: np.ndarray) -> bool:
    r = ring[:-1]
    n = len(r)
    for i in range(n):
        o, a, b = r[i], r[(i + 1) % n], r[(i + 2) % n]
        cross = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        if cross <= 0:
            return False
    return True


def _contains(ring: np.ndarray, p) -> bool:
    r = ring[:-1]
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        if cross < -1e-9:
            return False
    return True


def test_hull_properties_random():
    rng = np.random.default_rng(5)
    for _ in range(100):
        k = int(rng.integers(3, 60))
        pts = rng.uniform(-1e4, 1e4, (k, 2))
        g = K.convex_hull(Geom("MULTIPOINT", pts))
        if g.gtype != "POLYGON":
            continue  # collinear draw — covered by the degenerate test
        ring = g.coords[0]
        assert _is_ccw_convex(ring)
        in_set = {tuple(p) for p in pts}
        assert all(tuple(v) in in_set for v in ring[:-1])
        assert all(_contains(ring, p) for p in pts)


def test_hull_square_with_interior_points():
    g = parse_wkt("MULTIPOINT (0 0, 2 0, 2 2, 0 2, 1 1, 0.5 1.2)")
    assert to_wkt(K.convex_hull(g)) == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"


def test_hull_degenerate():
    assert to_wkt(K.convex_hull(parse_wkt("POINT (3 4)"))) == "POINT (3 4)"
    assert K.convex_hull(parse_wkt("MULTIPOINT (0 0, 1 1, 2 2)")).gtype == "LINESTRING"
    assert K.convex_hull(parse_wkt("MULTIPOINT (5 5, 5 5)")).gtype == "POINT"


def test_hull_of_polygon_covers_it():
    g = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    h = K.convex_hull(g)
    a_h, _ = K.area_perimeter(h)
    a_g, _ = K.area_perimeter(g)
    assert a_h >= a_g
    assert a_h == pytest.approx(16.0)


def test_layer_hull_golden(pages_dir):
    import pandas as pd

    from fgcspark.crs import tm35fin as tm

    polys = pd.read_parquet(f"{pages_dir}/polygons.parquet")
    gold = pd.read_parquet(f"{pages_dir}/layer_hulls.parquet").set_index("poly_id")
    for _, row in polys.iloc[::23].iterrows():
        g = K.transform_coords(parse_wkt(row["wkt"]), tm.geodetic_to_tm35)
        assert to_wkt(K.convex_hull(g)) == gold.loc[row["poly_id"], "hull_wkt"]
