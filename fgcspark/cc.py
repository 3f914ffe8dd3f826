"""Connected components over near-dup pairs -> dedup clusters.

A training-data pipeline does not stop at PAIRS: near-duplicate pairs
must be grouped into clusters (connected components) so exactly one
representative per cluster survives. The reference has no analogue;
this is a graft addition alongside the dedup family in textops.

Algorithm: FRONTIER-based min-label propagation expressed as
DataFrame algebra — only nodes whose label improved last round push
their label to their neighbors next round (a label can only improve
via a neighbor that itself just improved, so non-frontier nodes have
nothing new to say). Per iteration: one equi-join (frontier onto the
symmetrized edge table) + one groupBy(min) + one outer merge;
lineage is truncated every iteration with localCheckpoint so the
loop stays O(1) plan depth, and the checkpoints preserve their hash
partitioning (edges by v, labels by u) so steady-state rounds
shuffle only the SHRINKING frontier, not the full edge or label
table. Near-dup clusters have tiny diameters (chains of
near-identical docs), so the frontier collapses in a handful of
rounds; `max_iter` bounds the worst case and convergence (empty
frontier) is verified, not assumed.

At 10^12 docs: every stage is a hash shuffle on the node id, the
per-round moving set is O(|frontier|), and no driver state exists
beyond the one-row changed-count per iteration.
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
    # edges hash-partitioned by the message-receiving key ONCE; the
    # checkpoint pins that partitioning so per-round joins only
    # shuffle the frontier side
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .repartition("v")
        .localCheckpoint()
    )
    # state: (u, lbl, chg) — chg marks frontier membership; round 0
    # everyone is frontier (initial labels are "new" information)
    state = (
        nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("lbl"))
        .withColumn("chg", F.lit(True))
        .repartition("u")
        .localCheckpoint()
    )
    for _ in range(max_iter):
        frontier = state.where("chg").select(
            F.col("u").alias("v2"), F.col("lbl")
        )
        incoming = (
            sym.join(frontier, sym["v"] == F.col("v2"))
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr"))
        )
        new_state = (
            state.select("u", "lbl")
            .join(incoming, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce("nbr", "lbl")).alias("lbl"),
                (F.col("nbr").isNotNull() & (F.col("nbr") < F.col("lbl"))).alias("chg"),
            )
            .localCheckpoint()
        )
        # the new checkpoint is eager, so last round's state blocks can
        # be released NOW — without this every round leaks a full label
        # table into the block manager (at 10^12 nodes that is the job)
        prev, state = state, new_state
        prev.unpersist()
        # one-row control collect: how many labels improved this round
        n_changed = state.agg(
            F.sum(F.col("chg").cast("long")).alias("n")
        ).collect()[0]["n"]
        if not n_changed:
            break
    else:  # pragma: no cover - max_iter tuned far above real diameters
        raise RuntimeError("connected_components did not converge")
    sym.unpersist()
    # the returned state stays checkpoint-materialized (the caller's
    # result); everything else this function cached is released
    return state.select(F.col("u").alias(id_col), F.col("lbl").alias("cluster_id"))


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
