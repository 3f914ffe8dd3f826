"""WKT parser/formatter round-trips over the reference's observed
geometry vocabulary (SURVEY.md §1.2), including empties and unknown
tags (TRIANGLE passthrough, reference inst/tinytest/test_pkg.R:91-95)."""

import numpy as np
import pytest

from fgcspark.geom.wkt import Geom, WktError, parse_wkt, to_wkt


CASES = [
    "POINT (1 2)",
    "POINT (24.94 60.17)",
    "POINT EMPTY",
    "MULTIPOINT ((0 0), (1 1))",
    "LINESTRING (0 0, 1 1, 2 0)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "POLYGON EMPTY",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION (POINT (0 0), MULTIPOINT ((0 0)))",
    "TRIANGLE ((0 0, 0 1, 1 0, 0 0))",
    "GEOMETRYCOLLECTION (TRIANGLE ((0 0, 0 1, 1 0, 0 0)))",
]


@pytest.mark.parametrize("wkt", CASES)
def test_roundtrip(wkt):
    g = parse_wkt(wkt)
    assert to_wkt(g) == wkt
    # reparse of the formatted form is stable
    assert to_wkt(parse_wkt(to_wkt(g))) == wkt


def test_multipoint_bare_syntax():
    # both MULTIPOINT spellings are legal WKT; we canonicalize to wrapped
    g = parse_wkt("MULTIPOINT (0 0, 1 1)")
    assert to_wkt(g) == "MULTIPOINT ((0 0), (1 1))"
    assert g.coords.shape == (2, 2)


def test_empty_flags():
    assert parse_wkt("POINT EMPTY").is_empty
    assert parse_wkt("POLYGON EMPTY").is_empty
    assert parse_wkt("MULTIPOINT EMPTY").is_empty
    assert not parse_wkt("POINT (0 0)").is_empty


def test_float_fidelity():
    # %.7f coordinates (what the html carries) survive exactly
    s = "POINT (24.9412345 60.1765432)"
    g = parse_wkt(s)
    assert g.coords[0] == 24.9412345 and g.coords[1] == 60.1765432


def test_nested_gc():
    g = parse_wkt(
        "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (1 2)), POINT (3 4))"
    )
    assert g.gtype == "GEOMETRYCOLLECTION"
    assert g.coords[0].gtype == "GEOMETRYCOLLECTION"
    assert np.allclose(g.coords[1].coords, [3, 4])


@pytest.mark.parametrize(
    "bad", ["POINT 1 2", "POINT (1)", "POLYGON ((0 0, 1 1)", "", "POINT (1 2) x"]
)
def test_parse_errors(bad):
    with pytest.raises((WktError, ValueError, IndexError)):
        parse_wkt(bad)


def test_geom_repr_and_int_format():
    g = Geom("POINT", np.array([407685.0, 7116299.0]))
    assert to_wkt(g) == "POINT (407685 7116299)"  # ints render without .0
