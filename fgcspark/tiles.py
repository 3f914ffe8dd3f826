"""Raster <-> vector tile aggregation (north_rule).

A "raster" here is the dense per-parent-cell grid of child-cell
counts: for each 100 km FinBIF tile, the 10x10 array of its 10 km
sub-tile document counts in row-major order (index = (km_n % 10) * 10
+ (km_e % 10), matching the generator truth and the long-form
`raster_tiles_100km` query).

vector -> raster: one shuffle on the parent cell, then a dense-array
assembly inside the aggregation (sort sparse (idx, n) pairs, scatter
into a zero-filled array) — pure built-in expressions, no UDF.
raster -> vector: posexplode back to sparse long form, dropping
zeros. Round-tripping is lossless on non-empty cells (tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 10  # 10x10 sub-cells per parent
N_SUB = GRID * GRID


def sub_idx_col(e, n, sub_km: int = 10):
    """Row-major index of the sub_km cell inside its (sub_km*GRID) parent."""
    s = sub_km * 1000
    return (
        F.pmod(F.floor(n / s), F.lit(GRID)) * GRID + F.pmod(F.floor(e / s), F.lit(GRID))
    ).cast("int")


def raster_assemble(points: DataFrame, parent_col: str = "cell_100km") -> DataFrame:
    """points (with e/n + parent cell) -> (cell, raster: array<bigint>[100]).

    The sparse (sub_idx, n) pairs of each parent are scattered into a
    dense zero-filled array with a single expression: for each slot i,
    take the count whose index matches, else 0. The scatter runs over
    the already-aggregated sparse pairs (<=100 per parent), so its cost
    is O(100^2) per parent cell — trivial next to the shuffle."""
    sparse = (
        points.groupBy(F.col(parent_col).alias("cell"), sub_idx_col(F.col("e"), F.col("n")).alias("i"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("cell")
        .agg(F.map_from_arrays(F.collect_list("i"), F.collect_list("cnt")).alias("m"))
    )
    # try_element_at: absent sub-cells are legitimately missing from the
    # sparse map (ANSI element_at would throw on them)
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(N_SUB - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("m"), i.cast("int")), F.lit(0)
        ).cast("long"),
    )
    return sparse.select("cell", dense.alias("raster"))


def raster_to_vector(raster: DataFrame) -> DataFrame:
    """(cell, raster[100]) -> sparse long form (cell, sub_idx, n_docs),
    zero slots dropped — the exact inverse of raster_assemble over the
    same points (posexplode keeps this a narrow, shuffle-free op)."""
    return (
        raster.select("cell", F.posexplode("raster").alias("sub_idx", "n_docs"))
        .where(F.col("n_docs") > 0)
        .select("cell", F.col("sub_idx").cast("int"), "n_docs")
    )
