"""Douglas-Peucker simplification: DP guarantee (every input vertex
within eps of the simplified outline), vertex-subset property, ring
validity floor, determinism, and a collinear exact case."""

import numpy as np
import pytest

from fgcspark.geom import kernels as K
from fgcspark.geom.wkt import Geom, parse_wkt, to_wkt


def _max_dev(orig: np.ndarray, simp: np.ndarray) -> float:
    """Max distance from any original vertex to the simplified
    polyline (closed walk)."""
    worst = 0.0
    segs = list(zip(simp[:-1], simp[1:]))
    if (simp[0] != simp[-1]).any():
        segs.append((simp[-1], simp[0]))
    for p in orig:
        best = np.inf
        for a, b in segs:
            seg = b - a
            L2 = float(seg @ seg)
            t = 0.0 if L2 == 0 else float(np.clip((p - a) @ seg / L2, 0, 1))
            proj = a + t * seg
            best = min(best, float(np.hypot(*(p - proj))))
        worst = max(worst, best)
    return worst


def test_collinear_line_collapses():
    g = parse_wkt("LINESTRING (0 0, 1 0, 2 0, 3 0.0001, 4 0)")
    s = K.simplify(g, eps=0.001)
    assert to_wkt(s) == "LINESTRING (0 0, 4 0)"
    s2 = K.simplify(g, eps=0.00001)
    # the bump survives a tighter eps (plus whatever DP needs to honor it)
    assert [3.0, 0.0001] in s2.coords.tolist() and len(s2.coords) > 2


def test_dp_guarantee_random_rings():
    rng = np.random.default_rng(9)
    for _ in range(60):
        k = int(rng.integers(8, 40))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.7, 1.3, k)
        ring = np.stack(
            [1e4 * rad * np.cos(ang), 1e4 * rad * np.sin(ang)], axis=1
        )
        ring = np.vstack([ring, ring[:1]])
        g = K.simplify(Geom("POLYGON", [ring]), eps=500.0)
        out = g.coords[0]
        # vertex subset
        in_set = {tuple(p) for p in ring}
        assert all(tuple(p) in in_set for p in out)
        # closed, valid ring
        assert (out[0] == out[-1]).all() and len(out) >= 4
        # DP guarantee
        assert _max_dev(ring[:-1], out) <= 500.0 + 1e-9


def test_tiny_ring_kept_whole():
    g = parse_wkt("POLYGON ((0 0, 10 0, 0 10, 0 0))")
    s = K.simplify(g, eps=100.0)  # would collapse below a triangle
    assert to_wkt(s) == to_wkt(g)


def test_multipolygon_and_points_passthrough():
    m = parse_wkt("MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((9 9, 10 9, 10 10, 9 9)))")
    s = K.simplify(m, eps=0.1)
    assert s.gtype == "MULTIPOLYGON" and len(s.coords) == 2
    p = parse_wkt("POINT (1 2)")
    assert to_wkt(K.simplify(p, eps=5)) == "POINT (1 2)"


def test_deterministic():
    g = parse_wkt("LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0, 5 1, 6 0)")
    a = to_wkt(K.simplify(g, eps=0.5))
    b = to_wkt(K.simplify(g, eps=0.5))
    assert a == b
