"""kNN join via cell-ring expansion (BASELINE.json north_rule).

For a small probe set against a huge page table: iterative equi-join
on grid cells, expanding the Chebyshev cell ring per probe until its
k-th best distance is certified (no unscanned cell can hold a closer
point). Certification bound: cells at Chebyshev distance >= r+1 from
the probe's cell are entirely at Euclidean distance >= r*s from any
point inside the probe's cell (s = cell size), so once
kth_dist <= r_scanned * s the result is exact (SURVEY.md §7.3 #4).

Each iteration is one broadcast hash join + one small shuffle keyed by
probe_id — the page table is only scanned on the candidate cells
(at scale, with the pages table partitioned/bucketed by cell id, this
becomes a partition-pruned scan)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import window as W

from fgcspark.crs import tm35fin as tm

DEFAULT_CELL_KM = 50


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    probes: DataFrame,
    k: int = 5,
    cell_km: int = DEFAULT_CELL_KM,
    key_col: str = "url",
    max_rings: int = 64,
) -> DataFrame:
    """Exact kNN: (probe_id, url, dist) — k rows per probe.

    `points` needs `e`/`n` (EPSG:3067); `probes` needs
    (probe_id, lon, lat)."""
    s = float(cell_km * 1000)
    prows = probes.select("probe_id", "lon", "lat").collect()
    pid = np.array([r["probe_id"] for r in prows], dtype=np.int64)
    pe, pn = tm.geodetic_to_tm35(
        np.array([r["lon"] for r in prows]), np.array([r["lat"] for r in prows])
    )
    pcell = np.stack([np.floor(pn / s), np.floor(pe / s)], axis=1).astype(np.int64)

    pts = points.select(
        key_col,
        "e",
        "n",
        F.floor(F.col("n") / s).cast("long").alias("cell_n"),
        F.floor(F.col("e") / s).cast("long").alias("cell_e"),
    )

    active = np.ones(len(pid), dtype=bool)
    best: dict[int, list] = {}  # probe_id -> collected candidate rows (k best so far)
    results = []
    r = 0
    while active.any() and r <= max_rings:
        # ring r cells for each active probe
        cells = []
        for i in np.nonzero(active)[0]:
            cn, ce = pcell[i]
            if r == 0:
                ring = [(int(cn), int(ce))]
            else:
                ring = []
                for d in range(-r, r + 1):
                    ring.append((int(cn - r), int(ce + d)))
                    ring.append((int(cn + r), int(ce + d)))
                for d in range(-r + 1, r):
                    ring.append((int(cn + d), int(ce - r)))
                    ring.append((int(cn + d), int(ce + r)))
            for c in ring:
                cells.append((int(pid[i]), float(pe[i]), float(pn[i]), c[0], c[1]))
        if cells:
            cdf = spark.createDataFrame(
                cells, schema="probe_id long, pe double, pn double, cell_n long, cell_e long"
            )
            cand = pts.join(F.broadcast(cdf), ["cell_n", "cell_e"]).select(
                "probe_id",
                key_col,
                F.sqrt(
                    (F.col("e") - F.col("pe")) ** 2 + (F.col("n") - F.col("pn")) ** 2
                ).alias("dist"),
            )
            win = W.Window.partitionBy("probe_id").orderBy("dist", key_col)
            topk = (
                cand.withColumn("_rn", F.row_number().over(win))
                .filter(F.col("_rn") <= k)
                .drop("_rn")
            )
            for row in topk.collect():
                best.setdefault(int(row["probe_id"]), []).append(
                    (row[key_col], float(row["dist"]))
                )
        # certify: kth best <= r*s means no unscanned cell can beat it
        for i in np.nonzero(active)[0]:
            got = sorted(best.get(int(pid[i]), []), key=lambda t: (t[1], t[0]))[:k]
            best[int(pid[i])] = got
            if len(got) >= k and got[k - 1][1] <= r * s:
                active[i] = False
                for u, d in got:
                    results.append((int(pid[i]), u, d))
        r += 1
    if active.any():  # pragma: no cover - max_rings exhausted
        raise RuntimeError("kNN ring expansion did not certify all probes")
    return spark.createDataFrame(results, schema=f"probe_id long, {key_col} string, dist double")
