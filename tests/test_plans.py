"""Physical-plan regression tests.

At 100 TB the *shape* of the plan is the performance contract: one
Arrow UDF stage (not N duplicated ones), broadcast joins on the probe
path (no shuffle), column pruning through the UDF barrier down to the
scan, map-side partial aggregation, and predicate pushdown into
parquet. These asserts pin the shapes so a refactor that silently
degrades them (e.g. the 7x ArrowEvalPython duplication fixed in
71d9a0a) fails fast."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def pts(spark, pages_dir):
    from fgcspark.pipeline import pages_to_points

    return pages_to_points(spark, pages_dir)


def test_single_udf_stage_in_point_path(pts):
    """pages_to_points must run exactly ONE ArrowEvalPython node — the
    fused point+project kernel. Catalyst re-expansion of the struct into
    per-column UDF copies is the regression this guards against."""
    plan = plan_of(pts.select("url", "e", "n", "cell_10km"))
    # formatted mode prints each node once in the tree and once in the
    # detail section — count physical nodes by their "(id) Name" lines
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1


def test_column_pruning_reaches_scan(pts):
    """A 2-column projection must scan only what extraction needs
    (url + html), not the full page row."""
    plan = plan_of(pts.select("url", "cell_10km"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"url", "html"}


def test_pip_join_is_broadcast_no_shuffle(spark, pts, pages_dir):
    from fgcspark.joins.pip import pip_join

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    plan = plan_of(pip_join(spark, pts.select("url", "e", "n"), polys))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchange allowed on this path is the broadcast itself —
    # a bare "Exchange" node is a shuffle (BroadcastExchange is not)
    assert not re.findall(r"\(\d+\) Exchange\b", plan)


def test_tile_counts_partial_aggregation(spark, pages_dir):
    from fgcspark.pipeline import tile_counts

    plan = plan_of(tile_counts(spark, pages_dir, size_km=10))
    # partial (map-side) + final HashAggregate around exactly one shuffle
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_predicate_pushdown_to_parquet(spark, pages_dir):
    df = (
        spark.read.parquet(f"{pages_dir}/pages.parquet")
        .filter(F.col("lang") == "fi")
        .select("url")
    )
    plan = plan_of(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,fi\)", plan), plan


def test_media_metadata_stays_jvm_side(spark, pages_dir):
    """media_metadata is contractually built-in-function only: no
    Python evaluation node may appear in its plan."""
    from fgcspark.multimodal import media_metadata

    plan = plan_of(media_metadata(spark.read.parquet(f"{pages_dir}/media.parquet")))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_extraction_stays_jvm_side(spark, pages_dir):
    from fgcspark.extract import with_extracted

    df = with_extracted(spark.read.parquet(f"{pages_dir}/pages.parquet"))
    plan = plan_of(df.select("url", "extracted_text", "lat", "lon"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # formatted mode marks codegen membership per node
    assert "codegen id" in plan


def test_embed_neardup_is_distributed_cogroup(spark):
    """The exact embedding near-dup must be a cogrouped pandas plan
    with NO driver collect and NO broadcast of the vector table (the
    round-1 scale-killer was a collect + O(n*d) broadcast)."""
    from fgcspark.sim import embedding_neardup_pairs_vec

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(16)], "vec_id long, embedding array<double>"
    )
    df = embedding_neardup_pairs_vec(emb, tau=0.9, n_blocks=4)
    plan = plan_of(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan


def test_knn_single_materialization(spark, pts, pages_dir):
    """kNN scans the cached point projection, not the source, after
    the first ring: the probe-side parquet scan appears in the plan
    with InMemoryTableScan above it once knn_join ran."""
    from fgcspark.joins.knn import knn_join

    probes = spark.read.parquet(f"{pages_dir}/probes.parquet").limit(5)
    before = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    out = knn_join(spark, pts.select("url", "e", "n"), probes, k=3)
    assert out.count() == 15
    after = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    # the ONLY storage allowed to survive is the localCheckpoint backing
    # the returned (distributed) result — every per-round cache and the
    # point-projection cache must be gone
    leaked = after - before
    assert len(leaked) <= 1, f"knn_join leaked caches beyond its result: {leaked}"
    # and the result must be checkpoint-backed, not driver-collected:
    # its plan is a bare scan of the materialized RDD
    assert "Scan ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()


def test_bbox_pipeline_single_udf_stage(spark, pages_dir):
    """bbox mode must run ONE ArrowEvalPython stage (fused footprint +
    bbox kernels), not a chain of two Python runners."""
    from fgcspark.pipeline import geo_pipeline

    df = geo_pipeline(spark, pages_dir, geo="bbox", crs="wgs84").select("url", "geo_wkt")
    plan = plan_of(df)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1


def test_fp_partitioned_is_cogroup_no_broadcast_layer(spark, pages_dir):
    """The distributed footprint join must cogroup on the cell with NO
    broadcast of the layer and no driver-built index (the broadcast
    path remains available separately). Hot-cell factors may broadcast
    the tiny aggregate-only factor table, so the assertion targets the
    cover payload: the plan joins via FlatMapCoGroupsInPandas."""
    from fgcspark.extract import with_extracted
    from fgcspark.joins.fpjoin import footprint_join_partitioned
    from fgcspark.pipeline import load_pages

    pages = with_extracted(load_pages(spark, pages_dir)).limit(50)
    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    df = footprint_join_partitioned(spark, pages, polys, materialize=False)
    plan = plan_of(df)
    assert "FlatMapCoGroupsInPandas" in plan


def test_ring_counts_single_source_scan(spark, pages_dir):
    """The k-ring disk queries must scan the extract pipeline ONCE: the
    per-cell aggregate is eagerly localCheckpoint-ed, so both the hot
    probe selection and the neighbor join read the materialized RDD —
    the downstream plan contains no parquet scan at all."""
    from fgcspark.cells.hexgrid import hex_id, hex_ring_counts

    counts = (
        spark.read.parquet(f"{pages_dir}/pages.parquet")
        .select(F.length("html").alias("_l"))
        .select((F.col("_l") % 50).cast("long").alias("e"), F.lit(0.0).alias("n"))
        .select(hex_id(F.col("e") * 10000.0, F.col("n"), 5000.0).alias("hex_id"))
        .groupBy("hex_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )
    hot = counts.orderBy(F.desc("n_docs"), F.asc("hex_id")).limit(5)
    out = hex_ring_counts(hot, counts, k=2)
    plan = plan_of(out)
    assert "Scan parquet" not in plan and "FileScan" not in plan
    assert "Scan ExistingRDD" in plan
    assert out.count() > 0
