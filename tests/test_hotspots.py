"""Getis-Ord Gi* and Moran's I: agreement with an independent
brute-force implementation on a random grid, sign semantics on a
constructed hot spot, determinism, and plan purity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fgcspark.hotspots import getis_ord, morans_i

RNG = np.random.default_rng(5)


def _random_cells(n_draws=60, side=12, hi=40):
    cells = {}
    for _ in range(n_draws):
        nb, eb = int(RNG.integers(0, side)), int(RNG.integers(0, side))
        cells[(nb, eb)] = cells.get((nb, eb), 0) + int(RNG.integers(1, hi))
    return cells


def _to_rows(cells):
    rows, i = [], 0
    for (nb, eb), c in cells.items():
        for _ in range(c):
            rows.append((f"u{i}", f"{nb}:{eb}"))
            i += 1
    return rows


def _brute_gi(cells):
    ks = list(cells)
    x = np.array([cells[k] for k in ks], float)
    n, m = len(ks), np.mean([cells[k] for k in ks])
    s = np.sqrt((x * x).mean() - m * m)
    idx = {k: i for i, k in enumerate(ks)}
    out = {}
    for k in ks:
        nbrs = [
            idx[(k[0] + dn, k[1] + de)]
            for dn in (-1, 0, 1)
            for de in (-1, 0, 1)
            if (k[0] + dn, k[1] + de) in idx
        ]
        W, S = len(nbrs), x[nbrs].sum()
        out[f"{k[0]}:{k[1]}"] = (
            W,
            int(S),
            round((S - m * W) / (s * np.sqrt((n * W - W * W) / (n - 1))), 6),
        )
    return out


def _brute_moran(cells):
    ks = list(cells)
    x = np.array([cells[k] for k in ks], float)
    n, m = len(ks), x.mean()
    idx = {k: i for i, k in enumerate(ks)}
    num, Wp = 0.0, 0
    for k in ks:
        for dn in (-1, 0, 1):
            for de in (-1, 0, 1):
                if (dn, de) == (0, 0):
                    continue
                j = (k[0] + dn, k[1] + de)
                if j in idx:
                    num += (x[idx[k]] - m) * (x[idx[j]] - m)
                    Wp += 1
    return n, Wp, round((n / Wp) * num / ((x - m) ** 2).sum(), 6)


@pytest.fixture(scope="module")
def cells():
    return _random_cells()


@pytest.fixture(scope="module")
def df(spark, cells):
    return spark.createDataFrame(_to_rows(cells), "url string, cell_10km string")


def test_gi_star_vs_brute_force(df, cells):
    got = {r.cell: (r.w, r.neighbor_sum, r.gi_star) for r in getis_ord(df, 10).collect()}
    want = _brute_gi(cells)
    assert set(got) == set(want)
    for c in want:
        assert got[c][0] == want[c][0], c
        assert got[c][1] == want[c][1], c
        assert got[c][2] == pytest.approx(want[c][2], abs=2e-6), c


def test_moran_vs_brute_force(df, cells):
    r = morans_i(df, 10).collect()[0]
    n, w, want = _brute_moran(cells)
    assert (r.n_cells, r.w_pairs) == (n, w)
    assert r.morans_i == pytest.approx(want, abs=2e-6)


def test_hot_spot_sign(spark):
    """A dense 3x3 block in a sea of singletons: its center must be the
    map's strongest positive Gi*; a far-away singleton must be
    negative. Moran's I must be strongly positive (clustered map)."""
    cells = {(nb, eb): 1 for nb in range(10) for eb in range(10)}
    for nb in range(4, 7):
        for eb in range(4, 7):
            cells[(nb, eb)] = 50
    df = spark.createDataFrame(_to_rows(cells), "url string, cell_10km string")
    gi = {r.cell: r.gi_star for r in getis_ord(df, 10).collect()}
    assert gi["5:5"] == max(gi.values())
    assert gi["5:5"] > 2.0  # classic z > 1.96 hot-spot threshold
    assert gi["0:0"] < 0.0
    assert morans_i(df, 10).collect()[0].morans_i > 0.5


def test_uniform_map_moran_near_random(spark):
    """All-equal counts make the denominator zero -> Moran undefined;
    use a tiny perturbation instead and expect a finite value."""
    cells = {(nb, eb): 5 for nb in range(6) for eb in range(6)}
    cells[(0, 0)] = 6
    df = spark.createDataFrame(_to_rows(cells), "url string, cell_10km string")
    r = morans_i(df, 10).collect()[0]
    assert r.morans_i is not None and abs(r.morans_i) < 1.0


def test_degenerate_rasters_yield_null_gi(spark):
    """Gi* has no defined z-score when n=1, when one window covers all
    occupied cells (w=n), or when the raster is constant (s=0) — the
    engine must emit explicit NULL, not NaN/Infinity."""
    # n = 1 occupied cell
    one = spark.createDataFrame([("u0", "5:5")], "url string, cell_10km string")
    assert [r.gi_star for r in getis_ord(one, 10).collect()] == [None]
    # two adjacent cells, different counts: every 3x3 window holds both
    # occupied cells -> w = n = 2 for each
    both = spark.createDataFrame(
        _to_rows({(5, 5): 3, (5, 6): 1}), "url string, cell_10km string"
    )
    assert [r.gi_star for r in getis_ord(both, 10).collect()] == [None, None]
    # constant raster, cells far apart so w < n: s = 0
    const = spark.createDataFrame(
        _to_rows({(0, 0): 2, (9, 9): 2, (0, 9): 2}), "url string, cell_10km string"
    )
    assert [r.gi_star for r in getis_ord(const, 10).collect()] == [None] * 3


def test_packed_neighbor_guard(spark):
    """Easting-bucket 0 displaced by de=-1 must be NULL (no neighbor),
    not an aliased key in the previous northing row."""
    from fgcspark.cells.grid import packed_from_buckets, packed_neighbor

    df = spark.range(1).select(
        packed_neighbor(packed_from_buckets(F.lit(7), F.lit(0)), -1, -1).alias("under"),
        packed_neighbor(
            packed_from_buckets(F.lit(7), F.lit((1 << 20) - 1)), 0, 1
        ).alias("over"),
        packed_neighbor(packed_from_buckets(F.lit(7), F.lit(3)), 1, -1).alias("ok"),
    )
    r = df.collect()[0]
    assert r.under is None and r.over is None
    assert r.ok == (8 << 20) + 2


def test_plan_is_pure_jvm(df):
    for q in (getis_ord(df, 10), morans_i(df, 10)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
