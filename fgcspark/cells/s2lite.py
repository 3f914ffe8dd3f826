"""S2-style 64-bit hierarchical cell index over the EPSG:3067 plane.

The north_star asks for "H3/S2 cells"; neither library is available
(or appropriate — our frame is already a metric plane), so this module
implements the same *algebra* from scratch (documented substitution,
SURVEY.md §7.0b): a quadtree over a fixed root square with 64-bit cell
ids supporting level / parent / children / k-ring — the operations the
PIP prefilter, kNN ring expansion, and hot-cell salting need.

Encoding (level <= 28, 29 bits per axis):
    id = (level << 58) | (ix << 29) | iy
where ix = floor((E - X0) / size), iy = floor((N - Y0) / size) and
size = ROOT_SIDE_M / 2**level. The id is monotone in (level, ix, iy),
cheap to compute JVM-side (two floors + shifts, whole-stage codegen),
and every op below is integer arithmetic — no trig, no tables.

Root square: side 2^21 m (= 2097.152 km) anchored at (0, 6000000) —
covers the whole EPSG:3067 area of use with margin. Level 12 cells are
512 m; level 20 cells are 2 m.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROOT_SIDE_M = float(2**21)  # 2097.152 km
X0 = 0.0
Y0 = 6000000.0
MAX_LEVEL = 28
_IY_BITS = 29
_IX_SHIFT = 29
_LEVEL_SHIFT = 58
_COORD_MASK = (1 << _IY_BITS) - 1


def cell_size_m(level: int) -> float:
    return ROOT_SIDE_M / (1 << level)


# ---------------------------------------------------------------------------
# python-side algebra (used by driver code / kernels)
# ---------------------------------------------------------------------------


def encode(ix: int, iy: int, level: int) -> int:
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} out of range")
    return (level << _LEVEL_SHIFT) | (ix << _IX_SHIFT) | iy


def decode(cid: int) -> tuple[int, int, int]:
    """-> (ix, iy, level)"""
    return (
        (cid >> _IX_SHIFT) & _COORD_MASK,
        cid & _COORD_MASK,
        cid >> _LEVEL_SHIFT,
    )


def level(cid: int) -> int:
    return cid >> _LEVEL_SHIFT


def from_en(e: float, n: float, lvl: int) -> int:
    s = cell_size_m(lvl)
    return encode(int((e - X0) // s), int((n - Y0) // s), lvl)


def to_en(cid: int) -> tuple[float, float]:
    """Cell center in EPSG:3067."""
    ix, iy, lvl = decode(cid)
    s = cell_size_m(lvl)
    return X0 + (ix + 0.5) * s, Y0 + (iy + 0.5) * s


def parent(cid: int, steps: int = 1) -> int:
    ix, iy, lvl = decode(cid)
    if lvl - steps < 0:
        raise ValueError("no parent above level 0")
    return encode(ix >> steps, iy >> steps, lvl - steps)


def children(cid: int) -> list[int]:
    ix, iy, lvl = decode(cid)
    if lvl >= MAX_LEVEL:
        raise ValueError("max level reached")
    return [
        encode(2 * ix + dx, 2 * iy + dy, lvl + 1)
        for dy in (0, 1)
        for dx in (0, 1)
    ]


def k_ring(cid: int, k: int) -> list[int]:
    """All cells within Chebyshev distance k (the (2k+1)^2 disk)."""
    ix, iy, lvl = decode(cid)
    out = []
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            jx, jy = ix + dx, iy + dy
            if jx >= 0 and jy >= 0:
                out.append(encode(jx, jy, lvl))
    return out


def ring(cid: int, k: int) -> list[int]:
    """Cells at exactly Chebyshev distance k (the expansion shell)."""
    if k == 0:
        return [cid]
    ix, iy, lvl = decode(cid)
    out = []
    for d in range(-k, k + 1):
        for jx, jy in ((ix + d, iy - k), (ix + d, iy + k)):
            if jx >= 0 and jy >= 0:
                out.append(encode(jx, jy, lvl))
    for d in range(-k + 1, k):
        for jx, jy in ((ix - k, iy + d), (ix + k, iy + d)):
            if jx >= 0 and jy >= 0:
                out.append(encode(jx, jy, lvl))
    return out


# ---------------------------------------------------------------------------
# Spark column expressions (JVM-side, no UDF)
# ---------------------------------------------------------------------------


def cell_id_col(e: Column, n: Column, lvl: int) -> Column:
    """Level-lvl cell id from EPSG:3067 columns — pure arithmetic."""
    s = cell_size_m(lvl)
    ix = F.floor((e - F.lit(X0)) / F.lit(s)).cast("long")
    iy = F.floor((n - F.lit(Y0)) / F.lit(s)).cast("long")
    return (
        F.lit(lvl).cast("long") * F.lit(1 << _LEVEL_SHIFT)
        + ix * F.lit(1 << _IX_SHIFT)
        + iy
    )


def parent_col(cid: Column, steps: int = 1) -> Column:
    """Parent cell id — integer arithmetic on the packed form."""
    lvl = (cid / F.lit(1 << _LEVEL_SHIFT)).cast("long")
    ix = (cid / F.lit(1 << _IX_SHIFT)).cast("long") % F.lit(1 << _IY_BITS)
    iy = cid % F.lit(1 << _IX_SHIFT)
    d = F.lit(1 << steps)
    return (
        (lvl - F.lit(steps)) * F.lit(1 << _LEVEL_SHIFT)
        + (ix / d).cast("long") * F.lit(1 << _IX_SHIFT)
        + (iy / d).cast("long")
    )
