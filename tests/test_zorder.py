"""Z-order clustering: Spark expression vs independent bit-by-bit
Python twin, and the layout claim itself (clustered files have
tighter 2-D extents than row-order files)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fgcspark.cells.zorder import write_zordered, zorder_key, zorder_key_py


def test_zorder_key_matches_python_twin(spark):
    rng = np.random.default_rng(3)
    e = rng.uniform(100500, 729500, 500)
    n = rng.uniform(6610500, 7769500, 500)
    df = spark.createDataFrame(pd.DataFrame({"e": e, "n": n}))
    got = [r[0] for r in df.select(zorder_key(F.col("e"), F.col("n"))).collect()]
    want = [zorder_key_py(ei, ni) for ei, ni in zip(e, n)]
    assert got == want


def test_zorder_locality_monotone():
    """Nearby cells share high Morton bits: quadrant prefix property."""
    # two points in the same 2x2-cell quadrant differ only in the low
    # 2 bits of the code
    assert zorder_key_py(4000, 6000) >> 2 == zorder_key_py(5000, 7000) >> 2
    # crossing the quadrant boundary changes higher bits
    assert zorder_key_py(4000, 6000) >> 2 != zorder_key_py(6000, 6000) >> 2


def test_write_zordered_tightens_file_extents(spark, tmp_path):
    rng = np.random.default_rng(11)
    m = 20000
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(m)],
            "e": rng.uniform(100500, 729500, m),
            "n": rng.uniform(6610500, 7769500, m),
        }
    )
    df = spark.createDataFrame(pdf)
    zpath = str(tmp_path / "z")
    ppath = str(tmp_path / "plain")
    write_zordered(df, zpath, files_per_write=16)
    df.repartition(16).write.mode("overwrite").parquet(ppath)

    def mean_file_area(path):
        out = spark.read.parquet(path)
        part = out.withColumn("_f", F.input_file_name())
        ext = part.groupBy("_f").agg(
            (F.max("e") - F.min("e")).alias("de"), (F.max("n") - F.min("n")).alias("dn")
        )
        rows = ext.collect()
        return float(np.mean([r["de"] * r["dn"] for r in rows]))

    # round-trip is lossless
    assert spark.read.parquet(zpath).count() == m
    assert (
        spark.read.parquet(zpath).agg(F.expr("bit_xor(xxhash64(url))")).collect()[0][0]
        == df.agg(F.expr("bit_xor(xxhash64(url))")).collect()[0][0]
    )
    # clustered files cover far less area each than random-partitioned ones
    assert mean_file_area(zpath) < 0.25 * mean_file_area(ppath)


def test_zorder_16bit_domain_guard():
    # codes fit in 32 bits over the TM35FIN window at 1 km cells;
    # buckets above 16 bits wrap by construction (documented mask)
    assert zorder_key_py(729500, 7769500, 1000) < 2**32
    assert zorder_key_py(2**17 * 1000, 0, 1000) == zorder_key_py(0, 0, 1000)
