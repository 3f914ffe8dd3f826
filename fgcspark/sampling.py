"""Deterministic sampling operators for training-data pipelines.

Dataset curation needs samples that are (a) reproducible across runs
and engines, (b) stable under re-partitioning, and (c) cheap at 100 TB.
`df.sample()` gives none of that: it is seeded per-partition, so the
selected rows change whenever the input split layout changes. These
operators instead derive every selection decision from a content hash
of a key column — the same 56-bit md5 prefix used by the dedup family
(`textops.md5_56`), computable bit-identically in any md5-equipped
engine, which is what lets the DuckDB oracle re-derive each sample
exactly.

Three operators:

- ``hash_sample``   — Bernoulli(rate) by hash threshold. Map-only:
  a single codegen'd filter, no shuffle, trivially 100 TB-safe, and
  the filter pushes down past column pruning like any other predicate.
- ``hash_split``    — deterministic train/val/test assignment by
  disjoint hash ranges (the standard "split by hash of id" recipe,
  e.g. for holdout sets that survive dataset regeneration). Map-only.
- ``quota_sample``  — stratified quota: the n rows per group with the
  smallest key hash — an exact, order-independent "uniform n per
  stratum" sample (per-language / per-source quotas). Implemented as
  ``row_number`` over (group, hash) + rank filter: Spark >= 3.5 plans
  this as ``WindowGroupLimit``, which keeps a per-task top-n heap
  BEFORE the exchange, so each map task emits at most n rows per
  group and the shuffle carries O(n_groups * n * tasks-worth of
  heads), not the full table (plan-asserted in tests/test_sampling.py).

The reference has no sampling surface (its API converts whole
occurrence archives, R/finbif_geo_convert.R:63-118); these are graft
additions for the training-data pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fgcspark.textops import md5_56

# md5_56 yields 14 hex chars = 56 bits; thresholds scale rates by 2^56.
HASH_SPACE = 1 << 56


def _key_hash(key_col: str) -> Column:
    # cast-to-string so bigint ids hash identically to the oracle's
    # md5(CAST(k AS VARCHAR)); strings pass through the cast unchanged
    return md5_56(F.col(key_col).cast("string"))


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep rows where md5_56(key) < rate * 2^56 — a deterministic
    Bernoulli(rate) sample, independent of partitioning and engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_key_hash(key_col) < F.lit(int(rate * HASH_SPACE)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by disjoint hash ranges.

    ``weights`` maps label -> weight (normalized internally; iteration
    order fixes the range order, so pass an ordered dict). Every row
    gets exactly one label; a given key always lands in the same split,
    across runs, partitionings and engines.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _key_hash(key_col)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w / total
        cond = h < F.lit(int(acc * HASH_SPACE))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_sql(weights: dict[str, float], key_expr: str) -> str:
    """DuckDB/ANSI twin of hash_split's label expression (same
    thresholds, same hash)."""
    total = float(sum(weights.values()))
    h = f"CAST(concat('0x', substring(md5(CAST({key_expr} AS VARCHAR)), 1, 14)) AS BIGINT)"
    parts = ["CASE"]
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w / total
        parts.append(f"WHEN {h} < {int(acc * HASH_SPACE)} THEN '{name}'")
    parts.append(f"ELSE '{labels[-1][0]}' END")
    return " ".join(parts)


def balanced_sample(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Mixture rebalancing: downsample every group toward the smallest
    group's size by a deterministic per-group hash rate
    (rate_g = min_count / n_g, keep iff md5_56(key) < rate_g * 2^56) —
    the standard recipe for flattening a skewed language/source mix
    before training. Expected per-group kept counts are equal;
    selection is exact, engine-independent, and partition-invariant.

    Scale shape: one map-side-combined count aggregate (|groups| rows),
    one 1-row min, a broadcast join of the tiny rate table, then a
    map-only filter — the base table never shuffles.

    NULL groups: groupBy counts NULL as its own group and the rate join
    is null-safe (eqNullSafe), so NULL-group rows are sampled at their
    own rate like any other group instead of being silently dropped."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_m"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        F.col(group_col).alias("_g"),
        (F.col("_m").cast("double") / F.col("_n")).alias("_rate"),
    )
    thr = F.col("_rate") * F.lit(float(HASH_SPACE))
    return (
        df.join(F.broadcast(rates), df[group_col].eqNullSafe(rates["_g"]))
        .where(_key_hash(key_col).cast("double") < thr)
        .drop("_rate", "_g")
    )


def shuffle_rank(df: DataFrame, key_col: str, out_col: str = "rank") -> DataFrame:
    """Deterministic global training-order permutation: rank rows by
    (md5_56(key), key) — the standard 'shuffle by hash of id' that
    gives every run, engine, and partition layout the same order.

    Scale shape: delegates to windows.global_row_number (range
    exchange + per-partition offsets), never a single-task global
    window. The order key is a struct of (hash, key): struct ordering
    is hash-major with the key itself (native type, arbitrary length)
    as the tiebreak, so the permutation is total even across hash
    collisions — no fixed-width padding that could truncate long
    string keys."""
    from fgcspark.windows import global_row_number

    k = F.struct(
        _key_hash(key_col).alias("h"), F.col(key_col).alias("k")
    )
    ranked = global_row_number(df.withColumn("_shufkey", k), "_shufkey", out_col)
    return ranked.drop("_shufkey")


def quota_sample(
    df: DataFrame, group_col: str, n: int, key_col: str
) -> DataFrame:
    """Exact stratified quota: the ``n`` rows of each ``group_col``
    stratum with the smallest (md5_56(key), key) — ties broken by the
    key itself so the selection is total-ordered and engine-exact.
    Groups smaller than n are kept whole.

    Scale shape: rank-filter over a window is planned as
    WindowGroupLimit (partial per-task top-n heap before the single
    group-key exchange), so the shuffle payload is bounded by n rows
    per (task, group), never the full stratum.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        _key_hash(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )
