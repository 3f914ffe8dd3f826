"""Scalable global row number vs the single-task Window.orderBy."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fgcspark.windows import chunk_window, global_row_number


@pytest.fixture(scope="module")
def pages(spark, pages_dir):
    return spark.read.parquet(f"{pages_dir}/pages.parquet").select("url", "lang")


def test_matches_naive_global_window(spark, pages):
    got = global_row_number(pages, "url").select("url", "_rn")
    want = pages.select(
        "url", F.row_number().over(Window.orderBy("url")).alias("_rn")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_chunk_window_slice(spark, pages):
    got = sorted(r["url"] for r in chunk_window(pages, "url", 100, 50).collect())
    want = sorted(r["url"] for r in pages.orderBy("url").offset(100).limit(50).collect())
    assert got == want and len(got) == 50


def test_no_single_task_exchange(spark, pages):
    # the sorted layout is produced by a range exchange (parallel),
    # never a SinglePartition exchange; the checkpointed downstream
    # plan is a narrow mapInPandas over those blocks
    from pyspark.sql import functions as F

    staged = (
        pages.repartitionByRange(4, F.col("url"))
        .sortWithinPartitions("url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in staged.lower()
    assert "singlepartition" not in staged.lower()
    final = global_row_number(pages, "url")._jdf.queryExecution().executedPlan().toString()
    assert "singlepartition" not in final.lower()
    assert "mapinpandas" in final.lower()


def test_sessionize_boundaries(spark):
    from datetime import datetime as dt

    from fgcspark.windows import sessionize

    rows = [
        # user 1: 3 events, second exactly at the 1800 s gap (inclusive
        # -> same session), third 1 us past it (-> new session)
        (1, dt(2024, 1, 1, 0, 0, 0), 1),
        (1, dt(2024, 1, 1, 0, 30, 0), 2),
        (1, dt(2024, 1, 1, 1, 0, 0, 1), 3),
        # user 2: single event
        (2, dt(2024, 1, 1, 5, 0, 0), 4),
    ]
    df = spark.createDataFrame(rows, schema="user_id long, ts timestamp, event_id long")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_s=1800).collect()
    }
    assert got[1] == 1 and got[2] == 1  # inclusive boundary stays
    assert got[3] == 2  # 1 microsecond past the gap starts a session
    assert got[4] == 1
