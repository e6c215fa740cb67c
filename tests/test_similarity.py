"""Vector similarity parity (reference domain: tests/test_search.cpp):
brute-force == numpy oracle; LSH recall >= floor and == brute force when
probing all buckets; cosine==IP on normalized vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdx_spark.operators.similarity import (brute_force_topk, lsh_assign,
                                            lsh_topk)

DIM, N = 16, 400


@pytest.fixture(scope="module")
def emb_np():
    rng = np.random.default_rng(42)
    return rng.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark, emb_np):
    return spark.createDataFrame(
        [(i, emb_np[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<float>")


def np_topk(emb_np, q, k, metric="cosine"):
    e = emb_np.astype(np.float64)
    q = np.asarray(q, dtype=np.float64)
    if metric == "cosine":
        s = e @ q / (np.linalg.norm(e, axis=1) * np.linalg.norm(q))
    elif metric == "ip":
        s = e @ q
    else:
        s = -((e - q) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(N), -s))[:k]
    return [(int(i), float(s[i])) for i in order]


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2sq"])
def test_bruteforce_vs_numpy(emb_df, emb_np, metric):
    q = emb_np[7].tolist()
    got = [(r["vec_id"], r["score"]) for r in
           brute_force_topk(emb_df, q, k=10, metric=metric).collect()]
    want = np_topk(emb_np, q, 10, metric)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6 * max(1.0, abs(ws))


def test_cosine_equals_ip_on_normalized(spark, emb_np):
    """reference tests/test_search.cpp:289-333 analog."""
    nrm = emb_np / np.linalg.norm(emb_np, axis=1, keepdims=True)
    df = spark.createDataFrame([(i, nrm[i].tolist()) for i in range(N)],
                               "vec_id long, embedding array<float>")
    q = (nrm[3]).tolist()
    a = [r["vec_id"] for r in brute_force_topk(df, q, 10, "cosine").collect()]
    b = [r["vec_id"] for r in brute_force_topk(df, q, 10, "ip").collect()]
    assert a == b


def test_lsh_full_probe_equals_bruteforce(emb_df, emb_np):
    q = emb_np[11].tolist()
    bucketed = lsh_assign(emb_df, dim=DIM, n_planes=4)
    full = lsh_topk(bucketed, q, k=10, n_planes=4, nprobe=16)
    bf = brute_force_topk(emb_df, q, k=10, metric="cosine")
    assert [r["vec_id"] for r in full.collect()] == \
           [r["vec_id"] for r in bf.collect()]


def test_lsh_recall_reasonable_and_monotone(emb_df, emb_np):
    """recall monotonically non-decreasing in nprobe (reference
    test_search.cpp:81-120 analog, nprobe sweep)."""
    q = emb_np[5].tolist()
    bucketed = lsh_assign(emb_df, dim=DIM, n_planes=4).persist()
    want = {r["vec_id"] for r in
            brute_force_topk(emb_df, q, k=10, metric="cosine").collect()}
    last = -1.0
    for nprobe in [2, 6, 16]:
        got = {r["vec_id"] for r in
               lsh_topk(bucketed, q, k=10, n_planes=4, nprobe=nprobe).collect()}
        recall = len(got & want) / 10
        assert recall >= last - 1e-9
        last = recall
    assert last == 1.0  # full probe
    bucketed.unpersist()
