"""G9 full make-valid (fgcspark/geom/makevalid.py): pinned GEOS-semantics
goldens plus the exact parity-preservation property.

The reference delegates to GEOS st_make_valid
(R/finbif_geo_convert.R:415-419,469); no GEOS exists in this sandbox,
so correctness is established two ways:
- pinned goldens for the classic repair cases whose GEOS output is
  documented (bowtie -> two lobes, overlapping rings -> symmetric
  difference, spike dropped, doubled ring cancels);
- an exact area/parity invariant: for ANY input, a point off the
  boundaries is inside the repaired output iff the original rings
  enclose it an odd number of times (the even-odd definition of the
  linework method). Evaluated with rational arithmetic — no float
  tolerance anywhere.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import fgcspark.geom.kernels as K
from fgcspark.geom.makevalid import (
    _area2,
    _in_ring,
    _parity,
    _to_exact,
    polygon_needs_rebuild,
    rebuild_exact,
    rebuild_polygon,
)


def A(pts):
    return np.array(pts, dtype=float)


def _poly_sets(polys):
    """Order-insensitive comparable form: frozenset of rings, each a
    frozenset of (x, y) vertices."""
    return {
        frozenset(frozenset(map(tuple, r[:-1].tolist())) for r in poly)
        for poly in polys
    }


# ---------------------------------------------------------------- goldens


def test_bowtie_splits_into_two_lobes():
    polys = rebuild_polygon([A([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]])])
    assert _poly_sets(polys) == {
        frozenset([frozenset({(0.0, 0.0), (1.0, 1.0), (0.0, 2.0)})]),
        frozenset([frozenset({(1.0, 1.0), (2.0, 0.0), (2.0, 2.0)})]),
    }


def test_spike_is_dropped_keepcollapsed_false():
    polys = rebuild_polygon(
        [A([[0, 0], [4, 0], [4, 4], [2, 4], [2, 7], [2, 4], [0, 4], [0, 0]])]
    )
    assert len(polys) == 1 and len(polys[0]) == 1
    verts = {tuple(p) for p in polys[0][0][:-1].tolist()}
    assert (2.0, 7.0) not in verts
    assert {(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)} <= verts


def test_overlapping_rings_become_symmetric_difference():
    polys = rebuild_polygon(
        [
            A([[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]]),
            A([[2, 2], [5, 2], [5, 5], [2, 5], [2, 2]]),
        ]
    )
    assert len(polys) == 2
    # total area = 9 + 9 - 2*overlap(1) = 16, split 8/8
    areas = sorted(
        abs(float(_area2([tuple(map(Fraction, p)) for p in poly[0][:-1]]))) / 2
        for poly in polys
    )
    assert areas == [8.0, 8.0]


def test_doubled_ring_cancels_to_nothing():
    sq = [[0, 0], [1, 0], [1, 1], [0, 1]]
    polys = rebuild_polygon([A(sq + sq + [sq[0]])])
    assert polys == []


def test_valid_donut_roundtrips_with_hole():
    polys = rebuild_polygon(
        [
            A([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]]),
            A([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]),
        ]
    )
    assert len(polys) == 1 and len(polys[0]) == 2
    shell, hole = polys[0]
    assert float(_area2(_to_exact(shell))) == 72.0  # 2 * 36, CCW
    assert float(_area2(_to_exact(hole))) == -8.0  # 2 * 4, CW


def test_island_in_hole_becomes_two_polygons():
    polys = rebuild_polygon(
        [
            A([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
            A([[2, 2], [2, 8], [8, 8], [8, 2], [2, 2]]),
            A([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]),
        ]
    )
    assert sorted(len(p) for p in polys) == [1, 2]
    areas = sorted(
        sum(float(_area2(_to_exact(r))) for r in poly) / 2 for poly in polys
    )
    assert areas == [4.0, 100.0 - 36.0]


def test_hole_crossing_shell_yields_notch_and_outer_lobe():
    polys = rebuild_polygon(
        [
            A([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]),
            A([[2, 2], [6, 2], [6, 3], [2, 3], [2, 2]]),
        ]
    )
    areas = sorted(
        sum(float(_area2(_to_exact(r))) for r in poly) / 2 for poly in polys
    )
    # shell 16 minus in-shell hole part 2, plus the outside lobe 2
    assert areas == [2.0, 14.0]


def test_pinch_splits_at_touch_point():
    polys = rebuild_polygon(
        [A([[0, 0], [2, 0], [1, 1], [2, 2], [0, 2], [1, 1], [0, 0]])]
    )
    assert len(polys) == 2
    for poly in polys:
        assert len(poly) == 1
        assert not K.ring_self_intersects(poly[0])


# ------------------------------------------------------- trigger contract


def test_needs_rebuild_classification():
    valid_cases = [
        [A([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])],
        [
            A([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]]),
            A([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]),
        ],
        # hole touching shell at a vertex is OGC-valid
        [
            A([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]]),
            A([[0, 0], [2, 1], [1, 2], [0, 0]]),
        ],
    ]
    invalid_cases = [
        [A([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]])],
        [
            A([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]),
            A([[2, 2], [6, 2], [6, 3], [2, 3], [2, 2]]),
        ],
        # "hole" fully outside the shell
        [
            A([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]),
            A([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]),
        ],
        # hole nested inside another hole
        [
            A([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
            A([[2, 2], [2, 8], [8, 8], [8, 2], [2, 2]]),
            A([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]),
        ],
        # shell and hole sharing a positive-length boundary stretch
        [
            A([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]]),
            A([[0, 2], [2, 2], [2, 4], [0, 4], [0, 2]]),
        ],
    ]
    for rings in valid_cases:
        assert not polygon_needs_rebuild(rings), rings
    for rings in invalid_cases:
        assert polygon_needs_rebuild(rings), rings


def test_make_valid_polygons_routes_through_rebuild():
    bow = A([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]])
    valid, lines, points = K.make_valid_polygons([[bow]])
    assert len(valid) == 2 and lines == [] and points == []
    # fully-collapsing inputs still degrade through the fixture path
    flat = A([[0, 0], [5, 0], [0, 0]])
    v2, l2, p2 = K.make_valid_polygons([[flat]])
    assert v2 == [] and len(l2) == 1


# -------------------------------------------------- exact parity property


@st.composite
def messy_rings(draw):
    """Small-integer rings: mostly invalid (self-crossing, overlapping,
    arbitrary nesting) — the repair path's whole input domain."""
    k = draw(st.integers(3, 7))
    pts = [
        (draw(st.integers(0, 8)), draw(st.integers(0, 8))) for _ in range(k)
    ]
    return A([list(p) for p in pts] + [list(pts[0])])


def _sample_points():
    """Rational off-lattice grid; boundary hits are skipped exactly."""
    return [
        (Fraction(x) + Fraction(1, 3), Fraction(y) + Fraction(1, 7))
        for x in range(-1, 9)
        for y in range(-1, 9)
    ]


@settings(max_examples=250, deadline=None)
@given(st.lists(messy_rings(), min_size=1, max_size=3))
def test_rebuild_preserves_even_odd_parity_exactly(ring_list):
    rings = [r for r in (_to_exact(r) for r in ring_list) if len(r) >= 3]
    out = rebuild_exact(ring_list)
    out_rings = [cyc for poly in out for cyc in poly]
    from fgcspark.geom.makevalid import _on_ring_boundary

    for pt in _sample_points():
        if any(_on_ring_boundary(pt, r) for r in rings + out_rings):
            continue
        assert _parity(pt, rings) == _parity(pt, out_rings), (
            f"parity mismatch at {pt}"
        )


@settings(max_examples=250, deadline=None)
@given(st.lists(messy_rings(), min_size=1, max_size=3))
def test_rebuild_output_is_structurally_valid(ring_list):
    out = rebuild_exact(ring_list)
    for poly in out:
        shell = poly[0]
        assert _area2(shell) > 0, "shell must be CCW"
        for hole in poly[1:]:
            assert _area2(hole) < 0, "holes must be CW"
        # float-level simplicity (small-int inputs: rational vertices
        # are far enough apart that rounding cannot fake a crossing)
        for cyc in poly:
            arr = A([[float(x), float(y)] for x, y in cyc])
            assert not K.ring_self_intersects(arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(messy_rings(), min_size=1, max_size=2))
def test_rebuild_is_idempotent(ring_list):
    out = rebuild_polygon(ring_list)
    for poly in out:
        assert not polygon_needs_rebuild([r[:-1] for r in poly])


def test_centroid_of_repaired_bowtie_inside_hull():
    """End-to-end: repairing before centroid keeps A3/G3 meaningful on
    invalid input (the round-2 sliver bug class, now structurally
    unreachable for repaired polygons)."""
    bow = A([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]])
    valid, _, _ = K.make_valid_polygons([[bow]])
    from fgcspark.geom.wkt import MULTIPOLYGON, Geom

    g = Geom(MULTIPOLYGON, valid)
    cx, cy = K.centroid(g)
    assert 0.0 <= cx <= 2.0 and 0.0 <= cy <= 2.0
