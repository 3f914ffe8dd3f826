"""s2lite cell-index algebra: encode/decode, parent/children duality,
k-ring/shell composition, and Spark-column/Python agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fgcspark.cells import s2lite as s2


def test_encode_decode_roundtrip():
    for ix, iy, lvl in [(0, 0, 0), (123, 456, 12), ((1 << 20) - 1, 7, 20)]:
        assert s2.decode(s2.encode(ix, iy, lvl)) == (ix, iy, lvl)


def test_from_en_to_en():
    cid = s2.from_en(385000.0, 6672000.0, 12)
    assert s2.level(cid) == 12
    cx, cy = s2.to_en(cid)
    assert abs(cx - 385000.0) <= s2.cell_size_m(12) / 2
    assert abs(cy - 6672000.0) <= s2.cell_size_m(12) / 2
    # the center maps back to the same cell
    assert s2.from_en(cx, cy, 12) == cid


def test_parent_children_duality():
    cid = s2.from_en(500000.0, 6700000.0, 10)
    kids = s2.children(cid)
    assert len(kids) == 4 and len(set(kids)) == 4
    for kid in kids:
        assert s2.parent(kid) == cid
        assert s2.level(kid) == 11
    assert s2.parent(kids[0], steps=2) == s2.parent(cid)


def test_parent_contains_child_geometrically():
    cid = s2.from_en(431234.5, 6789876.5, 15)
    cx, cy = s2.to_en(cid)
    p = s2.parent(cid, 3)
    px, py = s2.to_en(p)
    half = s2.cell_size_m(12) / 2
    assert abs(cx - px) <= half and abs(cy - py) <= half


def test_k_ring_and_shell():
    cid = s2.from_en(500000.0, 6700000.0, 12)
    disk1 = s2.k_ring(cid, 1)
    assert len(disk1) == 9 and cid in disk1
    shell2 = s2.ring(cid, 2)
    assert len(shell2) == 16
    disk2 = s2.k_ring(cid, 2)
    assert set(disk2) == set(disk1) | set(shell2)
    assert s2.ring(cid, 0) == [cid]
    # shell cells are exactly Chebyshev distance 2 away
    ix, iy, _ = s2.decode(cid)
    for c in shell2:
        jx, jy, _ = s2.decode(c)
        assert max(abs(jx - ix), abs(jy - iy)) == 2


def test_k_ring_clips_at_domain_edge():
    cid = s2.encode(0, 0, 5)
    assert len(s2.k_ring(cid, 1)) == 4  # only the non-negative quadrant


def test_spark_column_matches_python(spark):
    rng = np.random.default_rng(3)
    e = rng.uniform(50000, 750000, 500)
    n = rng.uniform(6600000, 7800000, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(e, n)], schema="e double, n double"
    )
    got = df.select(
        s2.cell_id_col(F.col("e"), F.col("n"), 12).alias("cid"),
        s2.parent_col(s2.cell_id_col(F.col("e"), F.col("n"), 12), 2).alias("pid"),
    ).toPandas()
    want_c = [s2.from_en(a, b, 12) for a, b in zip(e, n)]
    want_p = [s2.parent(c, 2) for c in want_c]
    assert got["cid"].tolist() == want_c
    assert got["pid"].tolist() == want_p


def test_cell_size():
    assert s2.cell_size_m(0) == 2**21
    assert s2.cell_size_m(12) == 512.0
    assert s2.cell_size_m(20) == 2.0
    with pytest.raises(ValueError):
        s2.encode(0, 0, 99)
