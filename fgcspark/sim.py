"""Similarity search over an embedding column (array<float>).

Beyond-the-reference operators for the graft: brute-force cosine top-k
(correctness baseline) and an IVF-bucketed variant (the 100 TB path:
candidates come from the nprobe nearest centroid buckets only).

All dot products are JVM-side `zip_with`/`aggregate` expressions —
sequential left-fold sums, bitwise-reproducible in any engine that
folds left-to-right (the DuckDB oracle does)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine(a_vec, a_norm, b_vec, b_norm):
    return _dot(a_vec, b_vec) / (a_norm * b_norm)


def ann_topk_brute(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first n_queries vectors
    (query ids broadcast against the full table; ties broken by id)."""
    base = with_norm(df, vec_col)
    q = base.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    c = base.select(F.col(id_col), F.col("_v"), F.col("_norm"))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    cos = cosine(F.col("qv"), F.col("qn"), F.col("_v"), F.col("_norm"))
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        pairs.withColumn("cos", cos)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .select("query_id", id_col)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= tau).

    Brute all-pairs — the correctness baseline; at scale, LSH/IVF
    bucket first (see ivf_topk) so only bucket-local pairs are scored.
    sample_mod restricts both sides to id % sample_mod == 0."""
    base = with_norm(df, vec_col)
    if sample_mod:
        base = base.where(F.col(id_col) % sample_mod == 0)
    a = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"), F.col("_norm").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), F.col("_norm").alias("nb"))
    cos = cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= tau)
        .select("id_a", "id_b")
    )


def embedding_neardup_pairs_vec(
    df: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Vectorized twin of embedding_neardup_pairs: identical output,
    fully distributed (no driver collect, no whole-table broadcast).

    Shape: exact all-pairs scoring is decomposed into B(B+1)/2 block
    pairs — row with block i = id % B acts as the LEFT member of pairs
    (i, j>=i) and the RIGHT member of pairs (i<=j, j); a cogrouped
    applyInPandas scores each block pair with one numpy pass. Every
    vector moves through the shuffle ~(B+1) times and nothing touches
    the driver, so the exact baseline itself survives large n; the
    O(n^2/B) per-group work is inherent to EXACT near-dup — the
    sub-quadratic scale paths remain minhash_lsh_pairs / ivf_topk.

    Float-exactness contract: the JVM version folds the dot product
    left-to-right over dimensions (F.aggregate), and so does the DuckDB
    oracle. numpy's pairwise-summation `dot` would round differently,
    so this kernel reproduces the LEFT FOLD exactly — `acc += L[:,d] *
    R[:,d]` over dimensions d in order, each step an elementwise IEEE
    mul+add over the pair block (numpy does not fuse to FMA). The
    comparison `dot/(na*nb) >= tau` is the same expression tree too."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    left = base.withColumn("bi", blk).withColumn(
        "bj", F.explode(F.expr(f"sequence(bi, {n_blocks - 1})"))
    )
    right = base.withColumn("bj", blk).withColumn(
        "bi", F.explode(F.expr("sequence(0, bj)"))
    )

    out_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def fold_dots(L: "np.ndarray", R: "np.ndarray") -> "np.ndarray":
        acc = np.zeros((L.shape[0], R.shape[0]))
        for d in range(L.shape[1]):  # left fold over dimensions
            acc += L[:, d, None] * R[None, :, d]
        return acc

    def fold_norms(M: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(M.shape[0])
        for d in range(M.shape[1]):  # same left fold for the norms
            acc += M[:, d] * M[:, d]
        return np.sqrt(acc)

    def score(key, l: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        if len(l) == 0 or len(r) == 0:
            return empty
        lid = l["vec_id"].to_numpy(dtype=np.int64)
        rid = r["vec_id"].to_numpy(dtype=np.int64)
        lm = np.array(l["v"].tolist(), dtype=np.float64)
        rm = np.array(r["v"].tolist(), dtype=np.float64)
        cos = fold_dots(lm, rm) / (fold_norms(lm)[:, None] * fold_norms(rm)[None, :])
        if key[0] == key[1]:
            # diagonal group: both sides are the same block; keep each
            # unordered pair once via the id order
            li, ri = np.nonzero((cos >= tau) & (lid[:, None] < rid[None, :]))
            return pd.DataFrame({"id_a": lid[li], "id_b": rid[ri]})
        li, ri = np.nonzero(cos >= tau)
        a, b = lid[li], rid[ri]
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(score, out_schema)
    )


def embedding_neardup_pairs_ivf(
    df: DataFrame,
    tau: float = 0.9,
    centroid_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic near-dup: IVF-bucket first, score pairs ONLY
    within a bucket. The 100 TB path next to the exact block-cogroup
    baseline (embedding_neardup_pairs_vec): work drops from O(n^2/B)
    to sum over buckets of O(|bucket|^2), and a near-dup pair lands in
    the same bucket whenever both vectors agree on their nearest
    centroid — recall < 1 by design, deterministic spec so an external
    oracle can mirror it exactly."""
    base = with_norm(df, vec_col)
    cent = base.where(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"), F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    cos_c = cosine(F.col("cv"), F.col("cn"), F.col("_v"), F.col("_norm"))
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.col("cid"))
    assigned = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("ccos", cos_c)
        .withColumn("_rn", F.row_number().over(w_assign))
        .where(F.col("_rn") == 1)
        .select(id_col, "_v", "_norm", "cid")
    )
    a = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_norm").alias("na"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_norm").alias("nb"),
    )
    cos = cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
    return (
        a.join(b, "cid")  # bucket-local equi-join, never all-pairs
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= tau)
        .select("id_a", "id_b")
    )


def ivf_topk(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    centroid_mod: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: centroids = vectors with id % centroid_mod == 0;
    every vector is assigned to its max-cosine centroid (tie -> lowest
    centroid id); a query scans only its nprobe nearest centroid
    buckets. Deterministic spec (so an external oracle can mirror it);
    recall < 1 by design — the scale path next to ann_topk_brute."""
    base = with_norm(df, vec_col)
    cent = base.where(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"), F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    cos_c = cosine(F.col("cv"), F.col("cn"), F.col("_v"), F.col("_norm"))
    scored = base.crossJoin(F.broadcast(cent)).withColumn("ccos", cos_c)
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.col("cid"))
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w_assign))
        .where(F.col("_rn") == 1)
        .select(id_col, "_v", "_norm", "cid")
    )
    # query -> nprobe nearest centroids
    q = base.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    qc = q.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", cosine(F.col("cv"), F.col("cn"), F.col("qv"), F.col("qn"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.col("cid"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(w_probe))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    cand = assigned.join(F.broadcast(probes), "cid").where(
        F.col(id_col) != F.col("query_id")
    )
    cos_q = cosine(F.col("qv"), F.col("qn"), F.col("_v"), F.col("_norm"))
    w_k = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        cand.withColumn("cos", cos_q)
        .withColumn("_rn", F.row_number().over(w_k))
        .where(F.col("_rn") <= k)
        .select("query_id", id_col)
    )
