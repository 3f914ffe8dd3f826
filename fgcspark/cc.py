"""Connected components over near-dup pairs -> dedup clusters.

A training-data pipeline does not stop at PAIRS: near-duplicate pairs
must be grouped into clusters (connected components) so exactly one
representative per cluster survives. The reference has no analogue;
this is a graft addition alongside the dedup family in textops.

Algorithm: min-label propagation expressed as DataFrame algebra —
each node repeatedly adopts the minimum label among itself and its
neighbors until fixpoint. Per iteration: one equi-join (labels onto
symmetrized edges) + one groupBy(min) + one outer merge, all
shuffle-parallel; lineage is truncated every iteration with
localCheckpoint so the loop stays O(1) plan depth. Near-dup clusters
have tiny diameters (chains of near-identical docs), so the loop
converges in a handful of rounds; `max_iter` bounds the worst case
and convergence is verified, not assumed.

At 10^12 docs: every stage is a hash shuffle on the node id — no
driver state beyond the one-row convergence count per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_col, cluster_id): cluster_id = min node id reachable via
    `edges` (undirected); isolated nodes form singleton clusters."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("u"), F.col(id_col).alias("lbl")
    ).localCheckpoint()
    for _ in range(max_iter):
        incoming = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym["v"] == F.col("v2"))
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr"))
        )
        new_labels = (
            labels.join(incoming, "u", "left")
            .select("u", F.least(F.col("lbl"), F.coalesce("nbr", "lbl")).alias("lbl"))
            .localCheckpoint()
        )
        # labels are monotone non-increasing, so the exact label sum
        # (decimal: no int64 overflow at any scale) is a fixpoint
        # detector — one aggregation instead of a join of old vs new
        sig = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        prev_sig = getattr(labels, "_cc_sig", None)
        new_labels._cc_sig = sig
        labels = new_labels
        if prev_sig is not None and sig == prev_sig:
            break
    else:  # pragma: no cover - max_iter tuned far above real diameters
        raise RuntimeError("connected_components did not converge")
    return labels.select(F.col("u").alias(id_col), F.col("lbl").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, is_keeper): cluster by near-dup pairs; the
    keeper is the minimum doc id of its cluster (== cluster_id)."""
    cc = connected_components(docs.select(id_col), pairs, id_col=id_col)
    return cc.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_keeper"),
    )
