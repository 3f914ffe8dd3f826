"""Round-3 widening ops: hierarchical tile rollup, distance-within
join, as-of join, URL host normalization. Each checked against an
independent formulation (generator golden, brute force, or
pandas.merge_asof)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.joins.dwithin import dwithin_join, dwithin_join_partitioned
from fgcspark.pipeline import pages_to_points, tile_counts
from fgcspark.synth.pages import DW_RADIUS_M
from fgcspark.tiles import tile_rollup
from fgcspark.urlops import host_stats, norm_host


@pytest.fixture(scope="module")
def points(spark, pages_dir):
    return pages_to_points(spark, pages_dir).select("url", "e", "n").cache()


# --- distance-within join -------------------------------------------------


def test_dwithin_matches_golden(spark, pages_dir, points):
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    got = dwithin_join(spark, points, probes, radius_m=DW_RADIUS_M).toPandas()
    want = pd.read_parquet(f"{pages_dir}/dwithin.parquet")
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    assert key(got) == key(want)
    assert len(got) == len(want)  # no duplicate pairs either


def test_dwithin_partitioned_matches_driver_path(spark, pages_dir, points):
    # the distributed twin (no probe collect, offset-superset cover +
    # exact filter) must produce the identical pair set
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    a = dwithin_join_partitioned(spark, points, probes, DW_RADIUS_M).toPandas()
    b = dwithin_join(spark, points, probes, DW_RADIUS_M).toPandas()
    assert key(a) == key(b)
    assert len(a) == len(b)
    # and across cell sizes (different offset tables, same exact filter)
    c = dwithin_join_partitioned(spark, points, probes, DW_RADIUS_M, cell_km=50).toPandas()
    assert key(c) == key(b)


def test_dwithin_cell_size_invariant(spark, pages_dir, points):
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    key = lambda d: set(map(tuple, d[["probe_id", "url"]].itertuples(index=False)))
    a = dwithin_join(spark, points, probes, DW_RADIUS_M, cell_km=10).toPandas()
    b = dwithin_join(spark, points, probes, DW_RADIUS_M, cell_km=50).toPandas()
    assert key(a) == key(b)


def test_dwithin_brute_force_crosscheck(spark, pages_dir, points):
    """Independent of the generator golden: brute-force numpy over all
    pairs for a probe subset, different distance formulation (hypot)."""
    from fgcspark.crs import tm35fin as tm

    probes = spark.read.parquet(f"{pages_dir}/probes.parquet").limit(20)
    got = dwithin_join(spark, points, probes, DW_RADIUS_M).toPandas()
    pts = points.toPandas()
    pr = probes.toPandas()
    pe, pn = tm.geodetic_to_tm35(pr["lon"].to_numpy(), pr["lat"].to_numpy())
    want = set()
    for i, pid in enumerate(pr["probe_id"]):
        d = np.hypot(pts["e"].to_numpy() - pe[i], pts["n"].to_numpy() - pn[i])
        for u in pts["url"].to_numpy()[d <= DW_RADIUS_M]:
            want.add((pid, u))
    assert set(map(tuple, got[["probe_id", "url"]].itertuples(index=False))) == want


def test_dwithin_plan_is_broadcast_no_page_shuffle(spark, pages_dir, points):
    probes = spark.read.parquet(f"{pages_dir}/probes.parquet")
    plan = dwithin_join(spark, points, probes, DW_RADIUS_M)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- hierarchical tile rollup ---------------------------------------------


def test_tile_rollup_levels_consistent(spark, pages_dir):
    finest = tile_counts(spark, pages_dir, size_km=10)
    out = tile_rollup(finest, base_km=10, sizes=(10, 50, 100)).toPandas()
    total = finest.agg(F.sum("n_docs")).collect()[0][0]
    for res in (10, 50, 100):
        lvl = out[out["res_km"] == res]
        assert lvl["n_docs"].sum() == total
        assert lvl["cell"].is_unique


def test_tile_rollup_matches_direct_grouping(spark, pages_dir):
    """Rollup-from-finest must equal grouping the base table directly
    at each resolution (truth parquet = independent derivation)."""
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    finest = tile_counts(spark, pages_dir, size_km=10)
    out = tile_rollup(finest, base_km=10, sizes=(10, 50, 100)).toPandas()
    for res in (10, 50, 100):
        want = truth.groupby(f"cell_{res}km").size()
        lvl = out[out["res_km"] == res].set_index("cell")["n_docs"]
        assert lvl.sort_index().equals(want.sort_index().rename(None).astype("int64"))


def test_tile_rollup_rejects_non_multiple():
    import pyspark

    with pytest.raises(ValueError):
        # plan construction itself raises; no session work needed
        tile_rollup(None, base_km=10, sizes=(10, 25))  # type: ignore[arg-type]


# --- as-of join -----------------------------------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, schema="user_id long, ts timestamp, event_id long, value double"
    )


def test_asof_join_edge_cases(spark):
    from datetime import datetime as dt

    from fgcspark.asof import asof_join

    left = _mk_events(
        spark,
        [
            (1, dt(2024, 1, 1, 10), 100, 0.0),  # exact-ts right match (inclusive)
            (1, dt(2024, 1, 1, 9), 101, 0.0),  # before any right row -> null
            (2, dt(2024, 1, 1, 12), 102, 0.0),  # tie on right ts -> larger seq
            (3, dt(2024, 1, 1, 12), 103, 0.0),  # user with no right rows
        ],
    )
    right = _mk_events(
        spark,
        [
            (1, dt(2024, 1, 1, 10), 1, 1.5),
            (2, dt(2024, 1, 1, 11), 2, 2.5),
            (2, dt(2024, 1, 1, 11), 3, 3.5),
        ],
    )
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(
            left.drop("value"), right, "user_id", "ts", "event_id", ["value"]
        ).collect()
    }
    assert got[100] == (1, 1.5)
    assert got[101] == (None, None)
    assert got[102] == (3, 3.5)
    assert got[103] == (None, None)


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n = 400
    base = pd.Timestamp("2024-01-01").value
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n),
            "ts": pd.to_datetime(base + rng.integers(0, 10**12, n) * 1000),
            "event_id": np.arange(n),
            "value": rng.normal(size=n).round(3),
        }
    )
    left_pd = df.iloc[: n // 2]
    right_pd = df.iloc[n // 2 :]
    from fgcspark.asof import asof_join

    sl = spark.createDataFrame(left_pd).drop("value")
    sr = spark.createDataFrame(right_pd)
    got = (
        asof_join(sl, sr, "user_id", "ts", "event_id", ["value"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("ts").drop(columns="value"),
        right_pd.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_r"),
    ).sort_values("event_id").reset_index(drop=True)
    assert (
        got["asof_event_id"].fillna(-1).to_numpy()
        == want["event_id_r"].fillna(-1).to_numpy()
    ).all()
    gv = got["asof_value"].to_numpy()
    wv = want["value"].to_numpy()
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


# --- bbox range join + k-ring counts --------------------------------------


def test_bbox_range_join_brute_force(spark, pages_dir, points):
    from fgcspark.joins.bbox import bbox_range_join

    rects = [
        (0, 200000.0, 6700000.0, 300000.0, 6900000.0),
        (1, 500000.0, 7000000.0, 540000.0, 7040000.0),
        (2, 100500.0, 6610500.0, 729500.0, 7769500.0),  # whole window
    ]
    got = bbox_range_join(spark, points, rects).toPandas()
    pts = points.toPandas()
    want = set()
    for rid, x0, y0, x1, y1 in rects:
        hit = pts[(pts.e >= x0) & (pts.e <= x1) & (pts.n >= y0) & (pts.n <= y1)]
        want |= {(rid, u) for u in hit["url"]}
    assert set(map(tuple, got[["rect_id", "url"]].itertuples(index=False))) == want
    # the whole-window rect must return every point exactly once
    assert (got["rect_id"] == 2).sum() == len(pts)


def test_ring_counts_matches_pandas(spark, pages_dir):
    from fgcspark.cells.grid import ring_counts

    counts = tile_counts(spark, pages_dir, size_km=10)
    hot = counts.orderBy(F.desc("n_docs"), F.asc("cell")).limit(10)
    got = ring_counts(hot, counts, k=2).toPandas().set_index("cell")
    cpd = counts.toPandas()
    table = {c: n for c, n in zip(cpd["cell"], cpd["n_docs"])}
    for cell, row in got.iterrows():
        nb, eb = map(int, cell.split(":"))
        want = sum(
            table.get(f"{nb+dn}:{eb+de}", 0)
            for dn in range(-2, 3)
            for de in range(-2, 3)
        )
        assert row["n_docs_ring"] == want
        assert row["n_docs"] == table[cell]


# --- OLAP queries over the page table -------------------------------------


def test_lang_cell_rollup_consistency(spark, pages_dir):
    from fgcspark.pipeline import pages_to_points

    pts = pages_to_points(spark, pages_dir).select("lang", "cell_100km")
    got = (
        pts.rollup("lang", "cell_100km")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    total = len(pts.toPandas())
    grand = got[got.lang.isna() & got.cell_100km.isna()]
    assert len(grand) == 1 and int(grand.iloc[0]["n"]) == total
    per_lang = got[got.lang.notna() & got.cell_100km.isna()]
    assert int(per_lang["n"].sum()) == total
    leaf = got[got.lang.notna() & got.cell_100km.notna()]
    assert int(leaf["n"].sum()) == total


def test_top_hosts_per_cell_ranks(spark, pages_dir):
    import __spark_entry__ as E

    got = E._q_top_hosts_per_cell(spark, "/root/testdata/sf0.001").toPandas()
    # every cell has at most 3 rows, ranks 1..k, counts non-increasing
    for cell, grp in got.groupby("cell"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["n_pages"].diff().dropna() <= 0).all()
        assert len(grp) <= 3


# --- URL host ops ---------------------------------------------------------


def test_norm_host_forms(spark):
    urls = [
        ("https://WWW.Site.Example/x", "site.example"),
        ("http://site.example./y?q=1", "site.example"),
        ("https://sub.www.site.example/z", "sub.www.site.example"),
        ("https://site9.example/fi/page/9", "site9.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], schema="url string")
    got = [r[0] for r in df.select(norm_host(F.col("url"))).collect()]
    assert got == [w for _, w in urls]


def test_host_stats_counts(spark, pages_dir):
    pts = pages_to_points(spark, pages_dir).select("url", "lang", "cell_100km")
    got = host_stats(pts).toPandas().set_index("host")
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    hosts = truth["url"].str.extract(r"//([^/]+)/")[0]
    want_pages = truth.groupby(hosts).size()
    assert got["n_pages"].sort_index().astype("int64").equals(
        want_pages.sort_index().rename(None).astype("int64")
    )
    want_cells = truth.groupby(hosts)["cell_100km"].nunique()
    assert got["n_cells_100km"].sort_index().astype("int64").equals(
        want_cells.sort_index().rename(None).astype("int64")
    )
