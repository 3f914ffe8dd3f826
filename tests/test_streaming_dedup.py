"""Streaming exact dedup (fgcspark/streaming/dedup.py): duplicate
drops within the horizon, normalization semantics, state eviction past
the horizon (re-emission), and checkpointed resume."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fgcspark.streaming.dedup import streaming_exact_dedup

T0 = pd.Timestamp("2021-06-08 00:00:00")


def _write_pages(path, rows, mtime):
    """rows: list of (url, ts, text). mtime orders file-source pickup."""
    tbl = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array([r[2].encode() for r in rows], pa.binary()),
            "text": [r[2] for r in rows],
            "lang": ["fi"] * len(rows),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _drain(spark, stage, tmp_path, name, horizon):
    out, ck = str(tmp_path / f"{name}_out"), str(tmp_path / f"{name}_ck")
    streaming_exact_dedup(spark, str(stage), out, ck, horizon=horizon)
    return out, ck


def test_duplicates_dropped_within_horizon(spark, tmp_path):
    stage = tmp_path / "in"
    stage.mkdir()
    now = time.time()
    _write_pages(
        stage / "a.parquet",
        [
            ("u1", T0, "alpha beta"),
            ("u2", T0 + pd.Timedelta(minutes=1), "gamma delta"),
            ("u3", T0 + pd.Timedelta(minutes=2), "ALPHA  beta"),  # norm dup of u1
        ],
        now - 20,
    )
    _write_pages(
        stage / "b.parquet",
        [
            ("u4", T0 + pd.Timedelta(hours=1), "alpha beta"),  # dup, in horizon
            ("u5", T0 + pd.Timedelta(hours=1), "epsilon zeta"),  # fresh
        ],
        now - 10,
    )
    out, ck = _drain(spark, stage, tmp_path, "d1", horizon="30 days")
    fps = [r.fp for r in spark.read.parquet(out).collect()]
    assert len(fps) == 3  # alpha-beta, gamma-delta, epsilon-zeta
    assert len(set(fps)) == 3
    # resume with the same checkpoint: nothing new arrives, no new rows
    streaming_exact_dedup(spark, str(stage), out, ck, horizon="30 days")
    assert spark.read.parquet(out).count() == 3


def test_state_evicted_past_horizon_reemits(spark, tmp_path):
    """A copy arriving after the watermark evicted its original's state
    re-emits — the documented horizon semantics that bound state size
    at 100 TB. Three single-file batches (maxFilesPerTrigger=4, so
    mtime-ordered files land in one pass each... use distinct drains):
    batch1 seeds 'alpha'; batch2 advances the watermark 3 h; batch3's
    'alpha' copy is past the 1 h horizon and must pass through."""
    stage = tmp_path / "in2"
    stage.mkdir()
    now = time.time()
    _write_pages(stage / "a.parquet", [("u1", T0, "alpha")], now - 30)
    out, ck = _drain(spark, stage, tmp_path, "d2", horizon="1 hours")
    assert spark.read.parquet(out).count() == 1
    _write_pages(
        stage / "b.parquet",
        [("u2", T0 + pd.Timedelta(hours=3), "beta")],
        now - 20,
    )
    streaming_exact_dedup(spark, str(stage), str(out), ck, horizon="1 hours")
    assert spark.read.parquet(out).count() == 2
    # watermark is now ~T0+3h - 1h = T0+2h > T0 + 1h: alpha's state is gone
    _write_pages(
        stage / "c.parquet",
        [("u3", T0 + pd.Timedelta(hours=3, minutes=1), "alpha")],
        now - 10,
    )
    streaming_exact_dedup(spark, str(stage), str(out), ck, horizon="1 hours")
    fps = [r.fp for r in spark.read.parquet(out).collect()]
    assert len(fps) == 3  # alpha re-emitted after eviction
    assert len(set(fps)) == 2  # but it IS the same fingerprint


def test_dup_within_horizon_across_batches_still_dropped(spark, tmp_path):
    stage = tmp_path / "in3"
    stage.mkdir()
    now = time.time()
    _write_pages(stage / "a.parquet", [("u1", T0, "alpha")], now - 30)
    out, ck = _drain(spark, stage, tmp_path, "d3", horizon="10 hours")
    _write_pages(
        stage / "b.parquet",
        [("u2", T0 + pd.Timedelta(hours=3), "alpha")],  # within 10 h horizon
        now - 20,
    )
    streaming_exact_dedup(spark, str(stage), str(out), ck, horizon="10 hours")
    assert spark.read.parquet(out).count() == 1
