"""Z-order (Morton) clustering key for spatial write layout.

At 100 TB the dominant cost of a spatial query is the scan; file-level
min/max pruning (iceberg_lite manifests / parquet row-group stats) only
helps if rows that are near each other in space are near each other in
the file layout. Sorting by a Z-order interleave of the two tile-bucket
coordinates before writing gives every file a tight (e, n) bounding box
in BOTH axes — a plain sort by (n, e) gives tight n but full-width e
ranges, so bbox queries prune ~sqrt(files) instead of ~files.

The key is pure integer arithmetic (magic-number bit spreading) inside
whole-stage codegen — no UDF, no shuffle of its own; `repartitionByRange`
on the key is the single exchange a clustered write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit-spread constants: interleave a 16-bit value into the
# even bit positions of a 32-bit word (standard Morton encoding)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(v: Column) -> Column:
    """Spread the low 16 bits of v so bit i lands at position 2i."""
    out = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_key(easting: Column, northing: Column, cell_m: int = 1000) -> Column:
    """32-bit Morton code of the (easting, northing) cell buckets at
    cell_m resolution. Buckets must fit in 16 bits (65k cells/axis —
    65,536 km at 1 km cells; the TM35FIN working window uses < 8k)."""
    eb = F.floor(easting / F.lit(cell_m)).cast("long")
    nb = F.floor(northing / F.lit(cell_m)).cast("long")
    return (F.shiftleft(_spread_bits(nb), 1) + _spread_bits(eb)).alias("zorder")


def zorder_key_py(e: int, n: int, cell_m: int = 1000) -> int:
    """Reference Python twin of zorder_key for tests/oracles (direct
    bit-by-bit interleave — an independent formulation)."""
    eb, nb = int(e // cell_m) & 0xFFFF, int(n // cell_m) & 0xFFFF
    out = 0
    for i in range(16):
        out |= ((eb >> i) & 1) << (2 * i)
        out |= ((nb >> i) & 1) << (2 * i + 1)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cell_m: int = 1000,
    files_per_write: int | None = None,
    e_col: str = "e",
    n_col: str = "n",
) -> None:
    """Write df as parquet clustered by Z-order: range-repartition on
    the Morton key (one exchange), sort within partitions, drop the
    key. Each output file then covers a compact 2-D region, so
    file-level min/max stats on e/n prune bbox scans in both axes."""
    parts = files_per_write or df.sparkSession.sparkContext.defaultParallelism
    key = zorder_key(F.col(e_col), F.col(n_col), cell_m)
    (
        df.withColumn("_z", key)
        .repartitionByRange(parts, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
