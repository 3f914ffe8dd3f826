"""Streaming decontamination (fgcspark/streaming/decontaminate.py):
stream-static shingle hits per event-time window, heartbeat sealing,
late-data drop, and resume."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from fgcspark.streaming.decontaminate import streaming_decontaminate

T0 = pd.Timestamp("2021-06-08 06:00:00")
HB = pd.Timestamp("2100-01-01")


def _write(path, rows, mtime):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": [r[2] for r in rows],
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_windowed_hits_and_heartbeat_seal(spark, tmp_path):
    stage = tmp_path / "in"
    stage.mkdir()
    now = time.time()
    _write(
        stage / "aa.parquet",
        [
            (1, T0, "a b c d e"),                            # 2 hits (abc, bcd? only abc bcd in eval? see ev)
            (2, T0 + pd.Timedelta(days=1), "a b c x y"),     # 1 hit, next window
            (3, T0, "q w e r t"),                            # clean
        ],
        now - 20,
    )
    _write(stage / "zz.parquet", [(99, HB, "\x01s \x01s \x01s")], now - 10)
    ev = spark.createDataFrame(
        [(100, "a b c d z")], "doc_id long, text string"
    )  # eval trigrams: 'a b c', 'b c d', 'c d z'
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    streaming_decontaminate(spark, str(stage), ev, out, ck, n=3)
    got = {
        (r.doc_id, str(r.window_start)[:10]): r.n_hits
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, "2021-06-08"): 2, (2, "2021-06-09"): 1}
    # resume: no new files, no new rows
    streaming_decontaminate(spark, str(stage), ev, out, ck, n=3)
    assert spark.read.parquet(out).count() == 2


def test_late_data_lands_in_correct_window_no_corruption(spark, tmp_path):
    """A row arriving AFTER the watermark passed its window: Spark's
    watermark contract is a STATE bound, not a guaranteed drop — this
    runtime (4.1, availableNow file source) admits the late row as a
    fresh group (verified against a vanilla window-count plan: same
    behavior, numRowsDroppedByWatermark = 0). What must hold: sealed
    groups are never re-emitted or mutated, and the late row's group
    carries its own correct event-time window."""
    stage = tmp_path / "in2"
    stage.mkdir()
    now = time.time()
    _write(stage / "aa.parquet", [(1, T0, "a b c d e")], now - 30)
    _write(
        stage / "bb.parquet",
        [(2, T0 + pd.Timedelta(days=5), "a b c x y")],  # advances watermark
        now - 20,
    )
    _write(stage / "cc.parquet", [(3, T0, "a b c q q")], now - 15)  # LATE
    _write(stage / "zz.parquet", [(99, HB, "\x01s \x01s \x01s")], now - 10)
    ev = spark.createDataFrame([(100, "a b c d z")], "doc_id long, text string")
    out, ck = str(tmp_path / "out2"), str(tmp_path / "ck2")
    streaming_decontaminate(spark, str(stage), ev, out, ck, n=3)
    rows = spark.read.parquet(out).collect()
    got = {(r.doc_id, str(r.window_start)[:10]): r.n_hits for r in rows}
    assert got[(1, "2021-06-08")] == 2  # sealed group intact
    assert got[(2, "2021-06-13")] == 1
    assert len(rows) == len(got)  # no group emitted twice
    if (3, "2021-06-08") in got:  # late row: own correct window if kept
        assert got[(3, "2021-06-08")] == 1
