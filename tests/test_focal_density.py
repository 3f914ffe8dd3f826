"""focal_density (fgcspark/tiles.py): separable binomial blur equals
the hand-computed direct 2-D neighborhood sum."""

import pytest

from fgcspark.session import get_spark
from fgcspark.tiles import BINOMIAL, focal_density


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-focal")


def _direct(cells, weights=BINOMIAL):
    k = len(weights) // 2
    out = {}
    for (nb, eb), _ in cells.items():
        s = 0
        for dn in range(-k, k + 1):
            for de in range(-k, k + 1):
                s += cells.get((nb + dn, eb + de), 0) * weights[dn + k] * weights[de + k]
        out[(nb, eb)] = s
    return out


def test_focal_matches_direct_sum(spark):
    cells = {(0, 0): 10, (0, 1): 3, (1, 0): 7, (2, 2): 5, (5, 5): 1}
    df = spark.createDataFrame(
        [(f"{nb}:{eb}", n) for (nb, eb), n in cells.items()], "cell string, n_docs long"
    )
    rows = {r["cell"]: r for r in focal_density(df).collect()}
    want = _direct(cells)
    assert set(rows) == {f"{nb}:{eb}" for nb, eb in cells}
    for (nb, eb), w in want.items():
        r = rows[f"{nb}:{eb}"]
        assert r["wsum"] == w
        assert r["density"] == w / 256.0
        assert r["n_docs"] == cells[(nb, eb)]


def test_isolated_cell_density_is_center_weight(spark):
    df = spark.createDataFrame([("100:200", 4)], "cell string, n_docs long")
    r = focal_density(df).collect()[0]
    assert r["wsum"] == 4 * 6 * 6  # center weight 6 on both axes
    assert r["density"] == 144 / 256.0
