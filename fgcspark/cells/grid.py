"""FinBIF integer-km grids over ETRS-TM35FIN (and YKJ-style ids).

The reference's inputs carry precomputed grid-cell ids like
``"6693:3401"`` = km-northing:km-easting ("YKJ 1km, the center of the
observation area", reference inst/tinytest/laji-data.tsv:1-2). The
engine generalizes that scheme to 1/10/50/100 km tiles of EPSG:3067.

Cell id format: ``"{floor(N/size_m)}:{floor(E/size_m)}"`` — pure column
arithmetic, no shuffle, no UDF. At 100 TB this is the cheapest possible
tiling: two floors and a concat inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SIZES_KM = (1, 10, 50, 100)


def cell_id(easting: Column, northing: Column, size_km: int) -> Column:
    """String cell id '{kmN_bucket}:{kmE_bucket}' for a tile size."""
    size_m = size_km * 1000
    n_b = F.floor(northing / F.lit(size_m)).cast("long")
    e_b = F.floor(easting / F.lit(size_m)).cast("long")
    return F.concat_ws(":", n_b, e_b)


def cell_key(easting: Column, northing: Column, size_km: int) -> Column:
    """64-bit packed cell key (kmN_bucket << 20 | kmE_bucket) — the
    numeric twin of cell_id for shuffle keys (longs hash/compare faster
    than strings; 20 bits >> any terrestrial bucket count)."""
    size_m = size_km * 1000
    n_b = F.floor(northing / F.lit(size_m)).cast("long")
    e_b = F.floor(easting / F.lit(size_m)).cast("long")
    return F.shiftleft(n_b, 20) + e_b


def cell_id_np(easting, northing, size_km: int):
    """numpy twin of cell_id for use inside pandas-UDF kernels/oracles."""
    import numpy as np

    size_m = size_km * 1000
    n_b = np.floor(np.asarray(northing, dtype=np.float64) / size_m).astype(np.int64)
    e_b = np.floor(np.asarray(easting, dtype=np.float64) / size_m).astype(np.int64)
    return np.char.add(np.char.add(n_b.astype(str), ":"), e_b.astype(str))
