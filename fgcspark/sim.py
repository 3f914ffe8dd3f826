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
) -> DataFrame:
    """Vectorized twin of embedding_neardup_pairs: identical output,
    ~10x faster.

    Float-exactness contract: the JVM version folds the dot product
    left-to-right over dimensions (F.aggregate), and so does the DuckDB
    oracle. numpy's pairwise-summation `dot` would round differently,
    so this kernel reproduces the LEFT FOLD exactly — `acc += A[:,j] *
    B[:,j]` over dimensions j in order, each step an elementwise IEEE
    mul+add over the pair block (numpy does not fuse to FMA). The
    comparison `dot/(na*nb) >= tau` is the same expression tree too.

    Shape: the comparison matrix is broadcast (small at dim-table
    scale; at 10^12 rows you LSH/IVF-bucket first — minhash_lsh_pairs /
    ivf_topk are those paths), and each Arrow batch of rows is scored
    against all higher ids in one numpy pass inside mapInPandas."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = df.select(id_col, vec_col).collect()
    order = np.argsort(np.array([r[id_col] for r in rows]), kind="stable")
    ids = np.array([rows[i][id_col] for i in order], dtype=np.int64)
    mat = np.array([rows[i][vec_col] for i in order], dtype=np.float64)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids, mat))

    def fold_dots(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        acc = np.zeros((A.shape[0], B.shape[0]))
        for j in range(A.shape[1]):  # left fold over dimensions
            acc += A[:, j, None] * B[None, :, j]
        return acc

    out_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def run(batches):
        ids_all, mat_all = bc.value
        acc = np.zeros(mat_all.shape[0])
        for j in range(mat_all.shape[1]):  # same left fold for the norms
            acc += mat_all[:, j] * mat_all[:, j]
        nrm = np.sqrt(acc)
        pos = {int(v): i for i, v in enumerate(ids_all)}
        for pdf in batches:
            a_idx = np.array([pos[int(v)] for v in pdf["vec_id"]], dtype=np.int64)
            if len(a_idx) == 0:
                yield pd.DataFrame({"id_a": [], "id_b": []})
                continue
            dots = fold_dots(mat_all[a_idx], mat_all)
            cos = dots / (nrm[a_idx][:, None] * nrm[None, :])
            ai, bi = np.nonzero((cos >= tau) & (ids_all[a_idx][:, None] < ids_all[None, :]))
            yield pd.DataFrame(
                {"id_a": ids_all[a_idx][ai], "id_b": ids_all[bi]}
            )

    return df.select(F.col(id_col).alias("vec_id")).mapInPandas(run, out_schema)


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
