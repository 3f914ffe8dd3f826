"""Geohash cells: agreement with the classic iterative bisection
algorithm, the published 'ezs42' example, SQL-twin parity, prefix
hierarchy, and plan purity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.cells import geohash as gh

RNG = np.random.default_rng(11)
LON = RNG.uniform(19.0, 31.6, 3000)
LAT = RNG.uniform(59.5, 70.1, 3000)


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Classic iterative bisection (Niemeyer's algorithm), independent
    of the engine's quantize-and-interleave formulation."""
    lo_lon, hi_lon = -180.0, 180.0
    lo_lat, hi_lat = -90.0, 90.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[5 * i : 5 * i + 5]:
            v = v * 2 + b
        out.append(gh.BASE32[v])
    return "".join(out)


def test_known_example():
    assert _ref_geohash(-5.6, 42.6, 5) == "ezs42"  # the canonical example


def test_matches_iterative_reference(spark):
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LON, LAT)], "lon double, lat double"
    )
    got = [
        r.g
        for r in df.select(gh.geohash(F.col("lon"), F.col("lat"), 6).alias("g")).collect()
    ]
    want = [_ref_geohash(a, b, 6) for a, b in zip(LON, LAT)]
    assert got == want
    # and the canonical example through the Column path
    one = spark.createDataFrame([(-5.6, 42.6)], "lon double, lat double")
    assert one.select(gh.geohash(F.col("lon"), F.col("lat"), 5).alias("g")).first().g == "ezs42"


def test_sql_twin_parity(spark):
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LON[:500], LAT[:500])],
        "lon double, lat double",
    )
    got = [
        r.g
        for r in df.select(gh.geohash(F.col("lon"), F.col("lat"), 7).alias("g")).collect()
    ]
    con = duckdb.connect()
    con.register("p", pd.DataFrame({"lon": LON[:500], "lat": LAT[:500]}))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {gh.geohash_sql('lon', 'lat', 7)} FROM p"
        ).fetchall()
    ]
    assert got == want


def test_prefix_hierarchy(spark):
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LON[:300], LAT[:300])],
        "lon double, lat double",
    )
    both = df.select(
        gh.geohash(F.col("lon"), F.col("lat"), 4).alias("g4"),
        gh.geohash(F.col("lon"), F.col("lat"), 8).alias("g8"),
    ).collect()
    for r in both:
        assert r.g8.startswith(r.g4)


def test_boundary_clamp(spark):
    df = spark.createDataFrame([(180.0, 90.0), (-180.0, -90.0)], "lon double, lat double")
    out = [r.g for r in df.select(gh.geohash(F.col("lon"), F.col("lat"), 4).alias("g")).collect()]
    assert all(len(g) == 4 for g in out)  # clamped, not out-of-alphabet


def test_plan_is_pure_codegen(spark):
    df = spark.range(5).select(
        (F.col("id") * 1.0).alias("lon"), (F.col("id") * 1.0 + 60).alias("lat")
    )
    plan = (
        df.select(gh.geohash(F.col("lon"), F.col("lat")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
