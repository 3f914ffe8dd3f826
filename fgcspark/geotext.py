"""Geo x webtext fusion analytics: what is WRITTEN differently WHERE.

The reference pipeline ends at geometry (occurrences onto GIS layers,
R/convert.R); the graft's pages carry full extracted text, so the
natural next operator family scores the text conditioned on the
spatial cell — the corpus-inspection step a web-scale geo engine needs
for regional vocabulary drift, toponym mining, and geo-stratified
training-data curation.

All operators are pure DataFrame plans (explode + hash aggregates +
broadcast-sized dimension joins + WindowGroupLimit ranking); nothing
touches Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cell_distinctive_terms(
    df: DataFrame,
    k: int = 5,
    cell_col: str = "cell_50km",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Top-k TF-IDF-distinctive terms per grid cell.

    tf(cell, term) is the raw term count inside the cell; idf(term) is
    ln((N_cells + 1) / (cells_containing_term + 1)) — the standard
    smoothed inverse *cell* frequency, so a term used everywhere scores
    ~0 and a term concentrated in one cell scores ~tf * ln(N). Returns
    (cell, term, tf, score, rank) with deterministic (score desc, term
    asc) ranking; scores are rounded to `round_to` decimals BEFORE
    ranking so the JVM's and the oracle's libm ulp cannot flip either
    the hash or the order.

    Scale shape (100 TB): the explode feeds ONE corpus-sized shuffle —
    the map-side-combined (cell, term) count; everything downstream
    operates on the aggregated table (vocabulary x cells, not volume).
    Cell-frequency is a second hash agg of that table keyed by term;
    N_cells is a 1-row aggregate cross-joined back (broadcast by
    construction, the PageRank dangling-mass idiom); the idf join is
    term-keyed over vocabulary-sized inputs, AQE-broadcast when the
    vocab fits. The rank filter plans as WindowGroupLimit, so per-task
    top-k heaps run before the final exchange and the last shuffle
    carries O(cells x k x tasks) rows.
    """
    toks = df.select(
        F.col(cell_col).alias("cell"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("cell", "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__cf"))
    nc = tf.agg(F.countDistinct("cell").alias("__nc"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(nc))
        .select(
            "cell",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("__nc") + F.lit(1.0)) / (F.col("__cf") + F.lit(1.0))
                ),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cell").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cell_lang_entropy(
    df: DataFrame,
    cell_col: str = "cell_50km",
    lang_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Shannon entropy of the language mix per cell (nats) — the
    linguistic-diversity surface: ~0 for monolingual cells, ln(k) for a
    uniform k-language mix. Returns (cell, n_docs, n_langs, entropy).

    Scale shape: one corpus shuffle to the (cell, lang) count, then a
    cell-keyed agg of that small table; entropy is computed from the
    aggregated counts as sum(-p ln p) with the same rounding contract
    as cell_distinctive_terms.
    """
    cl = (
        df.select(F.col(cell_col).alias("cell"), F.col(lang_col).alias("lang"))
        .groupBy("cell", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cl.groupBy("cell").agg(F.sum("n").alias("n_docs"))
    return (
        cl.join(tot, "cell")
        .groupBy("cell")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(
                -F.sum(
                    (F.col("n") / F.col("n_docs"))
                    * F.log(F.col("n") / F.col("n_docs"))
                ),
                round_to,
            ).alias("entropy"),
        )
    )
