"""Deterministic sampling: partition-layout independence, exact quota
semantics vs a Python md5 oracle, split completeness + SQL-twin parity,
and the WindowGroupLimit / map-only plan shapes."""

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fgcspark import sampling as S


def _h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:14], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["fi", "sv", "en", "de"][i % 4], f"src{i % 3}") for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


def test_hash_sample_matches_python_oracle(docs):
    got = sorted(
        r.doc_id for r in S.hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()
    )
    want = sorted(i for i in range(400) if _h(i) < int(0.3 * S.HASH_SPACE))
    assert got == want
    assert 0 < len(got) < 400


def test_hash_sample_partitioning_invariant(docs):
    a = sorted(r.doc_id for r in S.hash_sample(docs, 0.5, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in S.hash_sample(docs.repartition(13, "lang"), 0.5, "doc_id").collect()
    )
    assert a == b


def test_quota_sample_exact(docs):
    out = S.quota_sample(docs, "lang", 7, "doc_id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert set(by_lang) == {"fi", "sv", "en", "de"}
    for lang, ids in by_lang.items():
        members = [i for i in range(400) if ["fi", "sv", "en", "de"][i % 4] == lang]
        want = sorted(members, key=lambda i: (_h(i), i))[:7]
        assert sorted(ids) == sorted(want)


def test_quota_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, g string"
    )
    out = S.quota_sample(df, "g", 5, "doc_id").collect()
    assert len(out) == 3


def test_hash_split_complete_and_matches_sql_twin(docs):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.hash_split(docs, weights, "doc_id").select("doc_id", "split").toPandas()
    assert len(out) == 400 and out["split"].notna().all()
    assert set(out["split"].unique()) <= set(weights)
    # every key in exactly one split, and the majority split dominates
    counts = out["split"].value_counts()
    assert counts.get("train", 0) > counts.get("val", 0)
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": range(400)}))
    twin = con.execute(
        f"SELECT doc_id, {S.split_sql(weights, 'doc_id')} AS split FROM d"
    ).df()
    merged = out.merge(twin, on="doc_id", suffixes=("_spark", "_sql"))
    assert (merged["split_spark"] == merged["split_sql"]).all()


def test_quota_plan_uses_window_group_limit(docs):
    plan = (
        S.quota_sample(docs, "lang", 5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_hash_sample_plan_is_map_only(docs):
    plan = (
        S.hash_sample(docs, 0.25, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_shuffle_rank_is_deterministic_permutation(docs):
    out = S.shuffle_rank(docs.select("doc_id"), "doc_id").toPandas()
    assert sorted(out["rank"]) == list(range(1, 401))
    want = sorted(range(400), key=lambda i: (_h(i), i))
    got = out.sort_values("rank")["doc_id"].tolist()
    assert got == want
    # partition-layout independent
    out2 = (
        S.shuffle_rank(docs.select("doc_id").repartition(7), "doc_id")
        .toPandas()
        .sort_values("rank")["doc_id"]
        .tolist()
    )
    assert out2 == want


def test_shuffle_rank_long_string_keys_total_order(spark):
    """Keys longer than any fixed pad width must still give a total
    order: the tiebreak is a struct of (hash, key), not a padded
    concat that would truncate long strings to a prefix order."""
    # colliding 56-bit md5 prefixes are unreachable in a test, so the
    # assertion is the full (hash, key) order over long keys whose
    # first 24+ chars are identical (a prefix order would tie them)
    keys = [("x" * 40 + f"{i:04d}") for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    out = S.shuffle_rank(df, "key", "rank").toPandas()
    want = sorted(keys, key=lambda k: (_h(k), k))
    assert out.sort_values("rank")["key"].tolist() == want


def test_balanced_sample_keeps_null_group(spark):
    """NULL is a group like any other: groupBy counts it, the rate join
    is null-safe, so NULL-group rows are sampled at their own rate
    instead of silently dropped."""
    rows = [(i, "fi") for i in range(40)] + [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = S.balanced_sample(df, "lang", "doc_id").toPandas()
    # both groups have size 40 == min -> rate 1.0: nothing is dropped
    assert len(out) == 80
    assert out["lang"].isna().sum() == 40


def test_balanced_sample_flattens_groups(spark):
    # skewed mix: 300 'big', 60 'mid', 30 'small'
    rows = [(i, "big") for i in range(300)]
    rows += [(1000 + i, "mid") for i in range(60)]
    rows += [(2000 + i, "small") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = S.balanced_sample(df, "lang", "doc_id").toPandas()
    counts = out.groupby("lang")["doc_id"].count()
    # smallest group kept whole (rate 1.0); others near its size
    assert counts["small"] == 30
    assert 15 <= counts["big"] <= 45 and 15 <= counts["mid"] <= 45
    # deterministic membership: re-running selects the same rows
    out2 = S.balanced_sample(df.repartition(9), "lang", "doc_id").toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
