"""Dedup clustering correctness + ANN (LSH/IVF) recall vs brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kmertools_spark.operators import (
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_topk,
    dedup_clusters,
)


def test_dedup_clusters_small_graph(spark):
    # components: {1,2,3,9} via 1-2, 2-3, 3-9; {5,7}; singleton {4}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 7)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], "doc_id long")
    got = {
        r.doc_id: r.cluster_id for r in dedup_clusters(pairs, ids).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5, 4: 4}


def test_dedup_clusters_chain_convergence(spark):
    # a long chain needs multiple label-propagation rounds
    n = 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id long")
    got = dedup_clusters(pairs, ids).agg(F.countDistinct("cluster_id")).first()[0]
    assert got == 1


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(4)
    base = rng.standard_normal((80, 16)).astype(np.float32)
    # plant near-duplicates so top-1 is meaningful
    base[40:50] = base[0:10] + 0.01 * rng.standard_normal((10, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(80), "embedding": [r.tolist() for r in base]}
    )
    return spark.createDataFrame(pdf)


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_recall_vs_bruteforce(spark, emb):
    q = emb.where("vec_id < 10")
    exact = _topk_sets(cosine_topk(emb, q, k=5))
    ivf = _topk_sets(ann_topk_ivf(emb, q, k=5, n_lists=4, n_probe=2))
    lsh = _topk_sets(ann_topk_lsh(emb, q, dim=16, k=5, n_planes=4))

    def recall(approx):
        hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
        return hits / sum(len(v) for v in exact.values())

    r_ivf, r_lsh = recall(ivf), recall(lsh)
    assert r_ivf >= 0.5, r_ivf
    assert r_lsh >= 0.3, r_lsh
    # planted near-duplicate must be found by IVF (same cell with high prob)
    top1 = {
        r.query_id: r.neighbor_id
        for r in ann_topk_ivf(emb, q, k=1, n_lists=4, n_probe=2).collect()
    }
    planted = sum(1 for qid in range(10) if top1.get(qid) == qid + 40)
    assert planted >= 7, (planted, top1)
