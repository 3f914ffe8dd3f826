#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Each query is forced end-to-end with a noop-format write (full
computation, no driver collect). Synthetic geo data generation is done
before timing starts. `docs_per_sec` is the BASELINE.json headline:
pages processed per second through the full spatial core
(extract -> point -> project -> tile -> PIP join + tile counts).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# flagship set: geo engine + reference relational semantics + training ops
BENCH_QUERIES = [
    "pages_extract_text",
    "pages_points_wkt",
    "pages_bbox_wkt",
    "pages_footprint_types",
    "pages_tiles",
    "pages_cells_jvm",
    "tile_counts_10km",
    "tile_counts_10km_salted",
    "s2_cell_counts_l10",
    "hex_cell_counts",
    "geohash_counts_p5",
    "quadkey_rollup_z10",
    "hex_ring_counts",
    "pip_join",
    "pip_counts",
    "fp_layer_join",
    "knn_k5",
    "knn_k5_partitioned",
    "dwithin_join",
    "tile_rollup",
    "host_stats",
    "pages_zorder",
    "bbox_range_join",
    "cell_ring_counts",
    "top_hosts_per_cell",
    "lang_cell_rollup",
    "token_percentiles",
    "cell_distinctive_terms",
    "cell_lang_entropy",
    "species_range",
    "species_cooccurrence",
    "facts_pivot",
    "latest_event_per_user",
    "events_asof_join",
    "event_sessions",
    "lineitem_agg",
    "revenue_by_nation",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "langid",
    "quality_signals",
    "token_counts",
    "doc_fingerprint",
    "embed_neardup",
    "embed_neardup_ivf",
    "dedup_clusters",
    "ann_topk_ivf",
    "media_metadata",
    "media_frames",
    "duplicate_spans",
    "remove_duplicate_spans",
    "unigram_logprob",
    "line_dedup",
    "decontaminate",
    "pii_scrub",
    "dbscan_cells",
    "getis_ord_gi10",
    "focal_density",
    "outlink_edges",
    "host_linkgraph",
    "host_pagerank",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --- placement self-check -------------------------------------------------
# This box is a VM; prior rounds measured host-level contention (steal
# 134-152 CPU-s under load, identical sub-plans swinging 4-15x) that no
# guest loadavg can see.  Every bench JSON therefore carries its own
# evidence: a /proc/stat steal delta across the timed region and a pure-CPU
# busy-loop ceiling (n-process vs 1-process iteration rate, zero I/O, zero
# synchronization) sampled before and after, so a reader can judge how much
# of the wall time is the engine and how much is the placement.

def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.8:
        x += 1
    return x


def _proc_stat():
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
        return dict(zip(keys, v))
    except OSError:
        return {}


def _busy_ceiling(n: int) -> float:
    """Measured speedup of n busy processes over 1 — the host's actual
    deliverable parallelism right now (== n on an idle dedicated host)."""
    import multiprocessing as mp

    one = _burn(None)
    with mp.Pool(n) as p:
        total = sum(p.map(_burn, range(n)))
    return round(total / one, 2)


def spatial_core(spark, sf_dir: str):
    """The headline job: one pass over pages -> points -> tiles,
    PIP-joined against the broadcast polygon layer, plus tile counts."""
    import __spark_entry__ as E
    from fgcspark.joins.pip import pip_join
    from fgcspark.pipeline import pages_to_points

    d = E._geo_dir(sf_dir)
    pts = pages_to_points(spark, d)
    polys = spark.read.parquet(f"{d}/polygons.parquet")
    joined = pip_join(spark, pts.select("url", "e", "n"), polys, cache_key=d)
    _force(joined)
    _force(
        pts.groupBy("cell_10km").count()
    )


def main() -> None:
    import __spark_entry__ as E
    from fgcspark.session import get_spark

    # the sf0.1 bench inputs are ~10 MB single files: split them finely
    # enough that the scan feeds all 32 cores (6 partitions at the 2m
    # default left 26 cores idle and tripled spatial_core wall time)
    os.environ.setdefault("FGC_MAX_PARTITION_BYTES", "256k")
    spark = get_spark("fgcspark-bench")

    # data prep + JVM/Python-worker warm-up OUTSIDE the timed region
    geo_dir = E._geo_dir(SF_DIR)
    n_pages = spark.read.parquet(f"{geo_dir}/pages.parquet").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from fgcspark.pipeline import pages_to_points

    _force(pages_to_points(spark, geo_dir).select("url", "e"))

    qs = E.queries()
    times: dict[str, float] = {}
    failures: dict[str, str] = {}

    ncpu = os.cpu_count() or 1
    ceiling_before = _busy_ceiling(ncpu)
    stat0 = _proc_stat()
    t_suite0 = time.time()

    core_s = None
    for _trial in range(2):
        t_core0 = time.time()
        spatial_core(spark, SF_DIR)
        dt = time.time() - t_core0
        core_s = dt if core_s is None else min(core_s, dt)
    times["spatial_core"] = round(core_s, 3)

    for name in BENCH_QUERIES:
        try:
            best = None
            for _trial in range(2):
                t0 = time.time()
                _force(qs[name](spark, SF_DIR))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # fast queries don't need a noise-reduction retrial;
                # anything slower gets a second run so first-execution
                # codegen/plan compile doesn't stick in the record
                # (interleaved A/B in BENCH/BASELINE.md measured 4-8 s
                # cold vs 0.2-0.7 s warm on pure-codegen queries)
                if dt < 2.0:
                    break
            times[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 - bench must always emit
            failures[name] = str(ex)[:200]

    suite_wall = time.time() - t_suite0
    stat1 = _proc_stat()
    ceiling_after = _busy_ceiling(ncpu)
    jiffy_delta = {k: stat1.get(k, 0) - stat0.get(k, 0) for k in stat0}
    busy = sum(jiffy_delta.get(k, 0) for k in ("user", "nice", "system", "steal"))
    placement = {
        "ncpu": ncpu,
        "busy_ceiling_before": ceiling_before,
        "busy_ceiling_after": ceiling_after,
        "steal_jiffies_during": jiffy_delta.get("steal", 0),
        "user_jiffies_during": jiffy_delta.get("user", 0),
        "steal_pct_of_busy": round(
            100.0 * jiffy_delta.get("steal", 0) / busy, 1
        ) if busy else 0.0,
        "suite_wall_sec": round(suite_wall, 1),
    }

    total = round(sum(times.values()), 3)
    out = {
        "placement": placement,
        "metric": "fgcspark flagship suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / core_s, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
