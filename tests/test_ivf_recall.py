"""Measured recall of the IVF scale paths against their exact
baselines — quantifies the documented recall<1 trade instead of just
asserting the spec. Floors are calibrated on the deterministic
sf0.001 embeddings (seeded generator, so these are regression pins,
not flaky statistics)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_ann_ivf_recall_vs_brute(emb):
    from fgcspark.sim import ann_topk_brute, ivf_topk

    k = 10
    brute = ann_topk_brute(emb, n_queries=5, k=k).select("query_id", "vec_id")
    ivf = ivf_topk(emb, n_queries=5, k=k, nprobe=2).select("query_id", "vec_id")
    b = set(map(tuple, brute.collect()))
    v = set(map(tuple, ivf.collect()))
    recall = len(b & v) / len(b)
    assert len(b) == 5 * k
    # measured 0.46 on the seeded sf0.001 embeddings (10 arbitrary
    # centroids over 500 weakly-clustered vectors, nprobe=2) — IVF
    # recall is data-dependent and this synthetic corpus is close to
    # the adversarial case; the floor pins against regression, the
    # exact brute path stays the correctness baseline
    assert recall >= 0.4, f"ANN IVF recall regressed: {recall:.3f}"
    # nprobe sweep is monotone non-decreasing in recall
    from fgcspark.sim import ivf_topk as topk

    v4 = set(map(tuple, topk(emb, n_queries=5, k=k, nprobe=4).collect()))
    assert len(b & v4) >= len(b & v)


def test_neardup_ivf_recall_vs_exact(emb):
    from fgcspark.sim import (
        embedding_neardup_pairs_ivf,
        embedding_neardup_pairs_vec,
    )

    exact = set(map(tuple, embedding_neardup_pairs_vec(emb, tau=0.4).collect()))
    ivf = set(map(tuple, embedding_neardup_pairs_ivf(emb, tau=0.4).collect()))
    assert ivf <= exact  # bucket-local pairs are a SUBSET: no false positives
    recall = len(ivf) / len(exact)
    # measured 0.26 at tau=0.4 on the seeded corpus: a 0.4-cosine
    # near-dup pair often straddles two buckets of 10 arbitrary
    # centroids. Documented recall<1 spec; the exact block-cogroup
    # path is the correctness baseline. Floor pins against regression.
    assert recall >= 0.2, f"near-dup IVF recall regressed: {recall:.3f}"
