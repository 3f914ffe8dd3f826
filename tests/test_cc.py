"""Connected-components dedup clustering (fgcspark.cc)."""

import pytest
from pyspark.sql import functions as F

from fgcspark.cc import connected_components, dedup_clusters


def test_cc_basic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # components: {0,1,2,3} (chain), {4,5}, {6}, {7}
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_cc_long_chain_converges(spark):
    n = 40  # diameter 40 chain: needs the iteration, not one hop
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = connected_components(nodes, edges, max_iter=50).collect()
    assert all(r["cluster_id"] == 0 for r in got)


def test_dedup_clusters_keeper(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([(3, 1), (1, 4)], "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in
           dedup_clusters(docs, pairs).collect()}
    assert got == {0: (0, True), 1: (1, True), 2: (2, True), 3: (1, False), 4: (1, False)}
