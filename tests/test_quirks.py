"""Bug-for-bug reference quirks exercised directly on the batch
kernels (SURVEY.md §2.6): the G4 `>1`-row substitution guard, the G11
POINT-not-MULTIPOINT diamond buffer, and the G12 degenerate bbox."""

import numpy as np
import pandas as pd
from pyspark.sql import Row

from fgcspark.pipeline import _bbox_batch, _footprint_batch, count_substitution_rows


def _fp(fp, lon, lat, substitute=True, geo="footprint", crs="wgs84"):
    return _footprint_batch(
        pd.Series(fp), pd.Series(lon, dtype=float), pd.Series(lat, dtype=float),
        substitute, geo, crs,
    ).tolist()


def test_g1_null_footprint_default():
    # NA -> POLYGON EMPTY, then cast to MULTI (G8)
    out = _fp([None], [np.nan], [np.nan], substitute=False)
    assert out == ["MULTIPOLYGON EMPTY"]


def test_g4_substitution_on():
    # empty or POINT footprint + valid coords -> MULTIPOINT((lon lat))
    out = _fp(["POLYGON EMPTY", "POINT (24.94 60.17)"], [24.5, 24.94], [60.5, 60.17])
    assert out[0] == "MULTIPOINT ((24.5 60.5))"
    assert out[1] == "MULTIPOINT ((24.94 60.17))"


def test_g4_guard_off_keeps_footprint():
    # with substitute=False (the table-wide >1 guard failed) the POINT
    # footprint is only MULTI-cast, not substituted
    out = _fp(["POINT (24.94 60.17)"], [20.0], [65.0], substitute=False)
    assert out == ["MULTIPOINT ((24.94 60.17))"]


def test_g4_guard_counting(spark):
    # the guard counts qualifying rows table-wide (R/finbif_geo_convert.R:268)
    schema = "footprint string, lon double, lat double"
    df = spark.createDataFrame(
        [
            (None, 1.0, 2.0),
            ("POINT (1 2)", 1.0, 2.0),
            ("POLYGON ((0 0, 1 0, 1 1, 0 0))", 1.0, 2.0),
            (None, None, 2.0),
        ],
        schema=schema,
    )
    assert count_substitution_rows(df) == 2
    one = spark.createDataFrame([(None, 1.0, 2.0)], schema=schema)
    assert count_substitution_rows(one) == 1  # guard would stay off


def test_g11_point_footprint_diamond_bbox_euref():
    # bbox mode: a bare POINT footprint is buffered 0.5 m quadsegs=1
    out = _bbox_batch(pd.Series(["POINT (500000 6700000)"]), "euref").tolist()
    assert out == [
        "POLYGON ((499999.5 6699999.5, 499999.5 6700000.5, "
        "500000.5 6700000.5, 500000.5 6699999.5, 499999.5 6699999.5))"
    ]


def test_g11_wgs84_roundtrips_through_3067():
    # wgs84 bbox of a POINT buffers in the metric frame: the resulting
    # bbox must span ~1 m, not 1 degree
    from fgcspark.crs import tm35fin as tm

    out = _bbox_batch(pd.Series(["POINT (24.94 60.17)"]), "wgs84").tolist()[0]
    from fgcspark.geom.wkt import parse_wkt

    ring = parse_wkt(out).coords[0]
    e, n = tm.geodetic_to_tm35(ring[:, 0], ring[:, 1])
    assert 0.9 < e.max() - e.min() < 1.1
    assert 0.9 < n.max() - n.min() < 1.1


def test_g12_multipoint_not_buffered():
    # quirk: single-coordinate MULTIPOINT (a G4 product) is NOT buffered
    # -> degenerate zero-area bbox polygon
    out = _bbox_batch(pd.Series(["MULTIPOINT ((10 20))"]), "euref").tolist()
    assert out == ["POLYGON ((10 20, 10 20, 10 20, 10 20, 10 20))"]


def test_gc_homogenization_only_in_footprint_mode():
    gc = "GEOMETRYCOLLECTION (POINT (24.94 60.17), MULTIPOINT ((24.95 60.18)))"
    fp_mode = _fp([gc], [np.nan], [np.nan], substitute=False, geo="footprint")
    bbox_mode = _fp([gc], [np.nan], [np.nan], substitute=False, geo="bbox")
    assert fp_mode[0].startswith("MULTIPOINT")
    assert bbox_mode[0].startswith("GEOMETRYCOLLECTION")


def test_facts_pivot_whitelist(spark):
    from fgcspark.facts import join_facts

    facts = spark.createDataFrame(
        [
            Row(Parent="r1", Fact="Vesistoalue", Value="Vantaa", ord=1),
            Row(Parent="r1", Fact="noise", Value="x", ord=2),
            Row(Parent="r2", Fact="Vesistoalue", Value="Aura", ord=3),
            Row(Parent="r2", Fact="Vesistoalue", Value="later", ord=4),
        ]
    )
    rows = spark.createDataFrame([Row(rid="r1"), Row(rid="r2"), Row(rid="r3")])
    out = join_facts(rows, facts, ["Vesistoalue"], "rid", order_col="ord").toPandas()
    got = out.set_index("rid")["Vesistoalue"].to_dict()
    # whitelist drops noise; min_by keeps the first by order; r3 -> null
    assert got["r1"] == "Vantaa" and got["r2"] == "Aura" and pd.isna(got["r3"])
