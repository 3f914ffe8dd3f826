"""Spatial-autocorrelation statistics over the km tile raster:
Getis-Ord Gi* hot-spot scores and global Moran's I.

The reference pipeline ends at tile counts (occurrences per FinBIF grid
cell, R/convert.R); the canonical next analytics step over such a
raster is "where is activity ANOMALOUSLY clustered" — Getis & Ord's
Gi* statistic (1992) per cell and Moran's I (1950) for the map as a
whole, both with the standard binary queen-contiguity weights (the
3x3 window on a square grid).

Determinism design: every spatial sum here is an aggregate of exact
64-bit integers (doc counts, neighbor counts, count products), so no
order-dependent floating-point accumulation exists anywhere; the only
float arithmetic is one closed-form scalar expression per output row
over those exact integers, which both engines evaluate identically up
to libm ulp and the 6-decimal rounding contract absorbs. This is the
entity_range stance extended to second-order statistics.

Scale shape (100 TB): one corpus-sized shuffle into the per-cell count
(map-side combined); the neighbor structure is an 8-offset explode of
the AGGREGATED cell table equi-joined back on the packed long key (the
dbscan idiom — occupied-cells-sized, not corpus-sized); global moments
are a broadcast 1-row aggregate of integer sums (the PageRank
dangling-mass idiom). No windows, no driver loops, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY_SHIFT = 20  # matches cells/grid.py cell_key: (nb << 20) | eb

# queen contiguity: the 8 surrounding cells (Gi* adds self separately)
_OFFSETS = [(dn, de) for dn in (-1, 0, 1) for de in (-1, 0, 1) if (dn, de) != (0, 0)]


def _cell_counts(points: DataFrame, cell_col: str) -> DataFrame:
    """(cell, n_docs, _k packed key) for occupied cells only — the
    statistical population is the set of occupied cells (documented:
    empty cells are not zeros in the population, matching how the
    tile raster itself is stored sparse)."""
    return (
        points.groupBy(F.col(cell_col).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "cell",
            "n_docs",
            (
                F.split("cell", ":")[0].cast("long") * F.lit(1 << _KEY_SHIFT)
                + F.split("cell", ":")[1].cast("long")
            ).alias("_k"),
        )
    )


def _neighbor_offsets_col():
    return F.array(
        *[
            F.struct(F.lit(dn).alias("dn"), F.lit(de).alias("de"))
            for dn, de in _OFFSETS
        ]
    )


def getis_ord(
    points: DataFrame,
    size_km: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Gi* hot-spot z-score per occupied cell (self-inclusive weights).

    With x_j the doc count of occupied cell j, n the number of occupied
    cells, W_i the number of occupied cells in i's 3x3 window
    (including i itself), and S_i their summed counts:

        mean = sum(x)/n ;  s = sqrt(sum(x^2)/n - mean^2)
        Gi*  = (S_i - mean*W_i) / (s * sqrt((n*W_i - W_i^2)/(n-1)))

    Positive scores mark hot spots (high values surrounded by high
    values), negative ones cold spots. Returns
    (cell, n_docs, w, neighbor_sum, gi_star) with gi_star rounded to
    `round_to` decimals in line with the engine-wide fp contract.
    """
    cell_col = f"cell_{size_km}km"
    counts = _cell_counts(points, cell_col)
    # candidate neighbor keys -> equi-join back on the occupied table;
    # union the self cell so weights are self-inclusive (Gi*, not Gi)
    cand = (
        counts.withColumn("_o", F.explode(_neighbor_offsets_col()))
        .select(
            F.col("_k").alias("_ki"),
            (
                F.col("_k")
                + F.col("_o.dn") * F.lit(1 << _KEY_SHIFT)
                + F.col("_o.de")
            ).alias("_kj"),
        )
        .unionByName(
            counts.select(F.col("_k").alias("_ki"), F.col("_k").alias("_kj"))
        )
    )
    hood = (
        cand.join(
            counts.select(F.col("_k").alias("_kj"), F.col("n_docs").alias("_xj")),
            "_kj",
        )
        .groupBy("_ki")
        .agg(F.count(F.lit(1)).alias("w"), F.sum("_xj").alias("neighbor_sum"))
    )
    glob = counts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_docs").alias("__sx"),
        F.sum(F.col("n_docs") * F.col("n_docs")).alias("__sxx"),
    )
    mean = F.col("__sx") / F.col("__n")
    s = F.sqrt(F.col("__sxx") / F.col("__n") - mean * mean)
    denom = s * F.sqrt(
        (F.col("__n") * F.col("w") - F.col("w") * F.col("w"))
        / (F.col("__n") - F.lit(1))
    )
    return (
        counts.join(hood, counts["_k"] == hood["_ki"])
        .crossJoin(F.broadcast(glob))
        .select(
            "cell",
            "n_docs",
            "w",
            "neighbor_sum",
            F.round(
                (F.col("neighbor_sum") - mean * F.col("w")) / denom, round_to
            ).alias("gi_star"),
        )
    )


def morans_i(
    points: DataFrame,
    size_km: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Global Moran's I of the occupied-cell doc counts under binary
    queen weights (one output row).

    All spatial sums reduce to exact integer aggregates:

        W  = number of neighbor pairs (ordered)
        P  = sum over pairs of x_i * x_j
        S2 = sum_i deg_i * x_i          (deg_i = occupied neighbors)
        sum_pairs (x_i - m)(x_j - m) = P - 2*m*S2 + m^2*W

    so  I = (n / W) * (P - 2*m*S2 + m^2*W) / (sum x^2 - n*m^2),
    evaluated as ONE closed-form scalar over exact integers — no
    float accumulation order anywhere. Returns
    (n_cells, w_pairs, morans_i).
    """
    cell_col = f"cell_{size_km}km"
    counts = _cell_counts(points, cell_col)
    cand = counts.withColumn("_o", F.explode(_neighbor_offsets_col())).select(
        F.col("_k").alias("_ki"),
        F.col("n_docs").alias("_xi"),
        (
            F.col("_k") + F.col("_o.dn") * F.lit(1 << _KEY_SHIFT) + F.col("_o.de")
        ).alias("_kj"),
    )
    pairs = cand.join(
        counts.select(F.col("_k").alias("_kj"), F.col("n_docs").alias("_xj")), "_kj"
    )
    pair_agg = pairs.agg(
        F.count(F.lit(1)).alias("__w"),
        F.sum(F.col("_xi") * F.col("_xj")).alias("__p"),
        F.sum("_xi").alias("__s2"),
    )
    glob = counts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_docs").alias("__sx"),
        F.sum(F.col("n_docs") * F.col("n_docs")).alias("__sxx"),
    )
    m = F.col("__sx") / F.col("__n")
    num = F.col("__p") - F.lit(2.0) * m * F.col("__s2") + m * m * F.col("__w")
    den = F.col("__sxx") - F.col("__n") * m * m
    return (
        pair_agg.crossJoin(F.broadcast(glob))
        .select(
            F.col("__n").alias("n_cells"),
            F.col("__w").alias("w_pairs"),
            F.round((F.col("__n") / F.col("__w")) * num / den, round_to).alias(
                "morans_i"
            ),
        )
    )
