"""Streaming session windows: stream output must equal the batch
session_window aggregation, agree with windows.sessionize on
boundary-free data, and respect checkpointed resume."""

import datetime as dt
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.streaming.sessions import (
    session_stats,
    streaming_session_stats,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
SENTINEL_USER = -1


@pytest.fixture()
def staged(tmp_path):
    arrivals = tmp_path / "events_in"
    arrivals.mkdir()
    shutil.copy(EVENTS, arrivals / "batch-000.parquet")
    # close-the-books heartbeat: advances the watermark past every real
    # session's end so append mode flushes them all on the drain
    ev = pd.read_parquet(EVENTS)
    hb = pd.DataFrame(
        {
            "event_id": [10**9],
            "ts": [ev["ts"].max() + dt.timedelta(days=3650)],
            "user_id": [SENTINEL_USER],
            "event_type": ["heartbeat"],
            "value": [0.0],
            "props": [""],
        }
    )
    hb["ts"] = hb["ts"].astype("datetime64[us]")  # micros, like the table
    hb.to_parquet(arrivals / "batch-zzz-heartbeat.parquet", index=False)
    return arrivals


def test_stream_sessions_match_batch(spark, staged, tmp_path):
    out = str(tmp_path / "sout")
    ck = str(tmp_path / "sck")
    streaming_session_stats(spark, str(staged), out, ck, gap="30 minutes")
    got = (
        spark.read.parquet(out)
        .where(F.col("user_id") != SENTINEL_USER)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        session_stats(spark.read.parquet(EVENTS), gap="30 minutes")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 15  # real multi-session data, not one blob per user


def test_session_window_agrees_with_batch_sessionize(spark):
    # same session COUNT per user as the lag/sum sessionize on data
    # with no exact-boundary gaps (microsecond-jittered generator ts)
    from fgcspark.windows import sessionize

    ev = spark.read.parquet(EVENTS)
    a = (
        session_stats(ev, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .toPandas()
        .set_index("user_id")["n_sessions"]
        .sort_index()
    )
    b = (
        sessionize(ev, gap_s=1800)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
        .toPandas()
        .set_index("user_id")["n_sessions"]
        .sort_index()
    )
    assert (a == b).all()


def test_stream_sessions_checkpoint_no_reemit(spark, staged, tmp_path):
    out = str(tmp_path / "rout")
    ck = str(tmp_path / "rck")
    streaming_session_stats(spark, str(staged), out, ck)
    n1 = spark.read.parquet(out).count()
    streaming_session_stats(spark, str(staged), out, ck)  # nothing new
    assert spark.read.parquet(out).count() == n1
