"""URL canonicalization: literal expectations, Spark/DuckDB twin
parity on adversarial cases, idempotence."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark.urlops import canonical_url, canonical_url_sql

CASES = [
    ("HTTPS://WWW.Ex.COM.:443/a?utm_source=1&b=2&a=1#f", "https://ex.com/a?a=1&b=2"),
    ("http://ex.com:8080", "http://ex.com:8080/"),
    ("http://ex.com:80/x?gclid=1", "http://ex.com/x"),
    (
        "https://Sub.Example.org/Path/Q?z=1&y=2&utm_campaign=c",
        "https://sub.example.org/Path/Q?y=2&z=1",
    ),
    ("http://plain.example/", "http://plain.example/"),
    ("https://h.example?fbclid=abc&k=v", "https://h.example/?k=v"),
]


def test_canonical_url_literals(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [w for _, w in CASES]


def test_canonical_url_sql_twin_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": [u for u, _ in CASES]}))
    want = [
        r[0] for r in con.execute(f"SELECT {canonical_url_sql('url')} FROM t").fetchall()
    ]
    assert got == want


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("url"))
    assert [r.url for r in once.collect()] == [r.url for r in twice.collect()]


def test_canonical_url_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("http://x.example/",)], "url string")
    plan = (
        df.select(canonical_url(F.col("url")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


def test_latest_crawl_newest_wins_and_ties_break_by_url(spark):
    from fgcspark.urlops import latest_crawl

    rows = [
        # one canonical group via case/tracking variants, distinct ts
        ("HTTPS://WWW.Ex.COM/a?utm_source=1&b=2&a=1", 5),
        ("https://ex.com/a?a=1&b=2", 9),
        ("https://EX.com:443/a?b=2&a=1", 7),
        # a tie group: same ts, url string decides (max wins)
        ("http://t.example/p?x=1", 3),
        ("http://T.Example/p?x=1", 3),
        # a singleton
        ("http://solo.example/", 1),
    ]
    df = spark.createDataFrame(rows, "url string, crawl_ts long")
    got = {
        r.canon_url: (r.url, r.crawl_ts)
        for r in latest_crawl(df, ts_col="crawl_ts").collect()
    }
    assert got["https://ex.com/a?a=1&b=2"] == ("https://ex.com/a?a=1&b=2", 9)
    # max(struct(ts, url)): lowercase 'h' > uppercase 'T' fails; compare:
    # "http://t.example/p?x=1" > "http://T.Example/p?x=1" (ASCII 't' > 'T')
    assert got["http://t.example/p?x=1"] == ("http://t.example/p?x=1", 3)
    assert got["http://solo.example/"] == ("http://solo.example/", 1)
    assert len(got) == 3
