"""JVM-expression TM35FIN twin: divergence from the numpy kernel is
bounded (< 1e-6 m), and on the generated datasets no point sits close
enough to a km-grid boundary for a cell assignment to flip."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fgcspark.crs import tm35fin as tm
from fgcspark.crs.tm35fin_expr import tm35_cols


def test_expr_matches_numpy_sub_micrometer(spark):
    rng = np.random.default_rng(17)
    lon = rng.uniform(19.0, 32.0, 20000)
    lat = rng.uniform(59.5, 70.1, 20000)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    got = (
        df.select(tm35_cols(F.col("lon"), F.col("lat")).alias("p"))
        .select("p.e", "p.n")
        .toPandas()
    )
    we, wn = tm.geodetic_to_tm35(lon, lat)
    de = np.abs(got["e"].to_numpy() - we).max()
    dn = np.abs(got["n"].to_numpy() - wn).max()
    assert de < 1e-6 and dn < 1e-6, (de, dn)


def test_generated_points_clear_of_km_boundaries(spark, pages_dir):
    """Guard for swapping kernels under tiling: every dataset point is
    > 1e-6 m from every 1 km grid line, so a sub-micrometer kernel
    divergence can never flip any 1/10/50/100 km cell id."""
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    for col in ("e", "n"):
        frac = np.abs(truth[col].to_numpy()) % 1000.0
        dist = np.minimum(frac, 1000.0 - frac)
        assert dist.min() > 1e-6


def test_jvm_core_cells_equal_numpy_core(spark, pages_dir):
    from fgcspark.pipeline import pages_to_points, pages_to_points_jvm

    cols = ["url", "cell_1km", "cell_10km", "cell_50km", "cell_100km"]
    a = pages_to_points(spark, pages_dir).select(cols).toPandas().sort_values("url")
    b = pages_to_points_jvm(spark, pages_dir).select(cols).toPandas().sort_values("url")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_expr_projection_is_codegen(spark):
    df = spark.range(1).select(
        (F.lit(25.0) + F.col("id")).alias("lon"), F.lit(62.0).alias("lat")
    )
    plan = (
        df.select(tm35_cols(F.col("lon"), F.col("lat")).alias("p"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
