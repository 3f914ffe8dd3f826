"""Streaming ingest: micro-batch output must equal the batch pipeline,
resume from the stream checkpoint must not re-ingest, and watermarked
windows must finalize correctly."""

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.streaming.ingest import ingest_points, windowed_tile_counts


@pytest.fixture()
def staged(spark, pages_dir, tmp_path):
    """Stage the sf0.001 pages parquet as an arrival directory."""
    arrivals = tmp_path / "arrivals"
    arrivals.mkdir()
    shutil.copy(f"{pages_dir}/pages.parquet", arrivals / "batch-000.parquet")
    return arrivals


def test_stream_ingest_matches_batch(spark, pages_dir, staged, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ingest_points(spark, str(staged), out, ck)
    got = spark.read.parquet(out)
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    got_pd = got.select("url", "cell_10km").toPandas().set_index("url").sort_index()
    want = truth.set_index("url").sort_index()
    assert (got_pd["cell_10km"] == want["cell_10km"]).all()
    assert len(got_pd) == len(want)


def test_stream_checkpoint_no_reingest(spark, pages_dir, staged, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ingest_points(spark, str(staged), out, ck)
    n1 = spark.read.parquet(out).count()
    # second drain with the same checkpoint: nothing new -> no new rows
    ingest_points(spark, str(staged), out, ck)
    assert spark.read.parquet(out).count() == n1
    # a NEW file arrives -> only its rows are appended
    shutil.copy(f"{pages_dir}/pages.parquet", staged / "batch-001.parquet")
    ingest_points(spark, str(staged), out, ck)
    assert spark.read.parquet(out).count() == 2 * n1


def test_windowed_tile_counts(spark, pages_dir, staged, tmp_path):
    out = str(tmp_path / "wout")
    ck = str(tmp_path / "wck")
    windowed_tile_counts(spark, str(staged), out, ck, window="1 hour", watermark="0 seconds")
    got = spark.read.parquet(out)
    # batch oracle: counts per (hour(warc_ts), cell)
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    pages = pd.read_parquet(f"{pages_dir}/pages.parquet")[["url", "warc_ts"]]
    j = truth.merge(pages, on="url")
    j["window_start"] = j["warc_ts"].dt.floor("h")
    want = (
        j.groupby(["window_start", "cell_10km"]).size().rename("n").reset_index()
    )
    got_pd = got.toPandas()

    def norm_ts(s):  # tz-aware/naive -> naive UTC string
        s = pd.to_datetime(s)
        if getattr(s.dt, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return s.astype(str)

    gk = dict(
        zip(
            zip(norm_ts(got_pd["window_start"]), got_pd["cell_10km"]),
            got_pd["n_docs"],
        )
    )
    want["ws"] = norm_ts(want["window_start"])
    # append mode with availableNow emits windows closed by the final
    # watermark; the LAST window may be withheld — skip it
    last = want["ws"].max()
    closed = want[want["ws"] < last]
    assert len(closed) > 0
    for r in closed.itertuples(index=False):
        assert gk.get((r.ws, r.cell_10km)) == r.n, (r.ws, r.cell_10km)


def test_stateful_dedup_across_batches_and_restarts(spark, pages_dir, staged, tmp_path):
    """applyInPandasWithState dedup: re-delivered urls (new files, same
    pages) must emit nothing; state survives a fresh AvailableNow run
    via the stream checkpoint."""
    from fgcspark.streaming.stateful import ingest_dedup

    out = str(tmp_path / "dout")
    ck = str(tmp_path / "dck")
    ingest_dedup(spark, str(staged), out, ck)
    n1 = spark.read.parquet(out).count()
    truth = pd.read_parquet(f"{pages_dir}/truth.parquet")
    assert n1 == len(truth)  # every url unique in batch 1 -> all emitted
    # the whole file re-arrives under a new name: all duplicates
    shutil.copy(f"{pages_dir}/pages.parquet", staged / "redelivery.parquet")
    ingest_dedup(spark, str(staged), out, ck)  # fresh query, same state store
    got = spark.read.parquet(out)
    assert got.count() == n1  # zero new emissions
    assert got.select("url").distinct().count() == n1
    # emitted cells match the batch truth
    got_pd = got.select("url", "cell_10km").toPandas().set_index("url").sort_index()
    want = truth.set_index("url").sort_index()
    assert (got_pd["cell_10km"] == want["cell_10km"]).all()


def test_streaming_pip_matches_batch(spark, pages_dir, staged, tmp_path):
    from fgcspark.joins.pip import pip_join
    from fgcspark.pipeline import pages_to_points
    from fgcspark.streaming.ingest import streaming_pip

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    out = str(tmp_path / "pip_out")
    ck = str(tmp_path / "pip_ck")
    streaming_pip(spark, str(staged), polys, out, ck)
    got = spark.read.parquet(out)
    want = pip_join(
        spark, pages_to_points(spark, pages_dir).select("url", "e", "n"), polys
    )
    key = lambda df: {(r["url"], r["poly_id"]) for r in df.collect()}
    assert key(got) == key(want)
    assert got.count() == want.count()


def test_streaming_pip_partitioned_matches_batch(spark, pages_dir, staged, tmp_path):
    """The foreachBatch + cogroup recipe equals batch pip_join_partitioned,
    and a second drain over the same checkpoint emits nothing new."""
    from fgcspark.joins.pip import pip_join_partitioned
    from fgcspark.pipeline import pages_to_points
    from fgcspark.streaming.ingest import streaming_pip_partitioned

    polys = spark.read.parquet(f"{pages_dir}/polygons.parquet")
    out = str(tmp_path / "pipp_out")
    ck = str(tmp_path / "pipp_ck")
    streaming_pip_partitioned(spark, str(staged), polys, out, ck)
    got = spark.read.parquet(out)
    want = pip_join_partitioned(
        spark, pages_to_points(spark, pages_dir).select("url", "e", "n"), polys
    )
    key = lambda df: {(r["url"], r["poly_id"]) for r in df.collect()}
    assert key(got) == key(want)
    assert got.count() == want.count()
    # idempotent re-drain: same checkpoint, no new files -> no new rows
    streaming_pip_partitioned(spark, str(staged), polys, out, ck)
    assert spark.read.parquet(out).count() == want.count()
