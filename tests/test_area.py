"""Polygon area/perimeter kernel: exact-rational cross-check (the
independent oracle for the shared-kernel layer golden), hole and
multipart semantics, closing-vertex invariance."""

from fractions import Fraction

import numpy as np
import pytest

from fgcspark.geom import kernels as K
from fgcspark.geom.wkt import parse_wkt


def _exact_ring_area2(ring: np.ndarray) -> Fraction:
    """Shoelace in exact rational arithmetic — every float is exactly
    representable as a Fraction, so this has NO rounding error."""
    r = ring.reshape(-1, 2)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    total = Fraction(0)
    n = len(r)
    for i in range(n):
        x1, y1 = Fraction(float(r[i, 0])), Fraction(float(r[i, 1]))
        x2, y2 = Fraction(float(r[(i + 1) % n, 0])), Fraction(float(r[(i + 1) % n, 1]))
        total += x1 * y2 - x2 * y1
    return total


def test_ring_area_matches_exact_rational():
    rng = np.random.default_rng(3)
    for _ in range(200):
        k = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 1.5, k)
        ring = np.stack(
            [1e5 + 1e4 * rad * np.cos(ang), 6.7e6 + 1e4 * rad * np.sin(ang)], axis=1
        )
        got = K.ring_area2(ring)
        want = float(_exact_ring_area2(ring))
        assert got == pytest.approx(want, rel=1e-12)


def test_area_perimeter_square_with_hole():
    g = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    a, p = K.area_perimeter(g)
    assert a == pytest.approx(15.0)
    assert p == pytest.approx(16.0 + 4.0)


def test_area_perimeter_multipolygon():
    g = parse_wkt(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 13 10, 13 11, 10 11, 10 10)))"
    )
    a, p = K.area_perimeter(g)
    assert a == pytest.approx(4.0 + 3.0)
    assert p == pytest.approx(8.0 + 8.0)


def test_closing_vertex_invariance():
    closed = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 2.0], [0.0, 0.0]])
    unclosed = closed[:-1]
    assert K.ring_area2(closed) == K.ring_area2(unclosed)
    assert K.ring_length(closed) == K.ring_length(unclosed)


def test_non_areal_rejected():
    with pytest.raises(ValueError):
        K.area_perimeter(parse_wkt("POINT (1 2)"))


def test_layer_golden_matches_engine_kernel(pages_dir):
    """The generator's forward golden equals a fresh local computation
    through parse -> project -> kernel (bit-identical), and is sane
    (positive areas, holes reduce area)."""
    import pandas as pd

    from fgcspark.crs import tm35fin as tm

    polys = pd.read_parquet(f"{pages_dir}/polygons.parquet")
    gold = pd.read_parquet(f"{pages_dir}/layer_stats.parquet").set_index("poly_id")
    for _, row in polys.iloc[::17].iterrows():
        g = K.transform_coords(parse_wkt(row["wkt"]), tm.geodetic_to_tm35)
        a, p = K.area_perimeter(g)
        assert a == gold.loc[row["poly_id"], "area_m2"]
        assert p == gold.loc[row["poly_id"], "perimeter_m"]
        assert a > 0 and p > 0
