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


def test_lsh_cosine_pairs_matches_allpairs(spark, emb_df, emb_np):
    """Scalable banded-LSH near-dup path == exact all-pairs on a corpus
    with planted exact duplicates (identical vectors share every bucket,
    so recall is 1.0 at near-duplicate thresholds)."""
    from pdx_spark.operators.dedup import embedding_cosine_pairs
    from pdx_spark.operators.similarity import lsh_cosine_pairs
    dup = emb_df.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + N).alias("vec_id"), "embedding")
    both = emb_df.unionByName(dup)
    exact = {(r["id_a"], r["id_b"], r["cosine"]) for r in
             embedding_cosine_pairs(both, threshold=0.999).collect()}
    lsh = {(r["id_a"], r["id_b"], r["cosine"]) for r in
           lsh_cosine_pairs(both, threshold=0.999, n_planes=6,
                            bands=4).collect()}
    assert len(exact) >= N // 20  # the planted duplicates exist
    assert lsh == exact


def test_ann_index_save_load_roundtrip(spark, tmp_path, emb_df, emb_np):
    """Persisted index -> load -> same top-k as pre-save (reference
    save/load parity, python/pdxearch/index_factory.py:47-66)."""
    from pdx_spark.operators.similarity import AnnIndex
    path = str(tmp_path / "ann_idx")
    built = AnnIndex.build(emb_df, path, n_planes=4)
    q = emb_np[13].tolist()
    pre = [(r["vec_id"], round(r["score"], 9)) for r in
           built.topk(q, k=10, nprobe=16).collect()]
    loaded = AnnIndex.load(spark, path)
    assert loaded.meta == built.meta
    post = [(r["vec_id"], round(r["score"], 9)) for r in
            loaded.topk(q, k=10, nprobe=16).collect()]
    assert pre == post
    bf = [r["vec_id"] for r in
          brute_force_topk(emb_df, q, k=10, metric="cosine").collect()]
    assert [v for v, _ in post] == bf  # full probe == exact


def test_lsh_topk_batch_equals_per_query(spark, emb_df, emb_np):
    """One-job batched LSH == per-query lsh_topk, probe-for-probe."""
    from pdx_spark.operators.similarity import lsh_topk_batch
    bucketed = lsh_assign(emb_df, dim=DIM, n_planes=4).persist()
    queries = [(i, emb_np[i].tolist()) for i in (3, 9, 27)]
    batch = lsh_topk_batch(bucketed, queries, k=10, n_planes=4, nprobe=6)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["score"], 9)))
    for qid, qv in queries:
        solo = sorted(((r["vec_id"], round(r["score"], 9)) for r in
                       lsh_topk(bucketed, qv, k=10, n_planes=4,
                                nprobe=6).collect()),
                      key=lambda t: (-t[1], t[0]))
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == solo, \
            f"query {qid}"
    bucketed.unpersist()


def test_ivf_full_probe_equals_bruteforce_and_roundtrip(spark, tmp_path,
                                                        emb_df, emb_np):
    """IVF (learned k-means buckets) at nprobe=n_clusters == brute force,
    and save/load returns identical results — the reference's literal
    IVF machinery (clustering.hpp:28-120, ivf_wrapper.hpp:15-38) on the
    same AnnIndex artifact format."""
    from pdx_spark.operators.similarity import AnnIndex
    path = str(tmp_path / "ivf_idx")
    built = AnnIndex.build_ivf(emb_df, path, n_clusters=8)
    assert built.meta["kind"] == "ivf"
    assert len(built.meta["centroids"]) == 8
    q = emb_np[13].tolist()
    pre = [(r["vec_id"], round(r["score"], 9)) for r in
           built.topk(q, k=10, nprobe=8).collect()]
    loaded = AnnIndex.load(spark, path)
    assert loaded.meta == built.meta
    post = [(r["vec_id"], round(r["score"], 9)) for r in
            loaded.topk(q, k=10, nprobe=8).collect()]
    assert pre == post
    bf = [r["vec_id"] for r in
          brute_force_topk(emb_df, q, k=10, metric="cosine").collect()]
    assert [v for v, _ in post] == bf


def test_ivf_recall_beats_or_matches_lsh_at_equal_nprobe(spark, emb_df,
                                                         emb_np):
    """Learned buckets should not lose to random hyperplanes at equal
    probe budget: mean recall@10 over a query sample, 16 buckets each,
    nprobe=4 (1/4 of the corpus' buckets). Also checks IVF recall
    monotone in nprobe and ==1.0 at full probe."""
    from pdx_spark.operators.similarity import (ivf_assign, ivf_topk_batch,
                                                ivf_train, lsh_assign,
                                                lsh_topk)
    cents = ivf_train(emb_df, n_clusters=16)
    assigned = ivf_assign(emb_df, cents).persist()
    lsh_b = lsh_assign(emb_df, dim=DIM, n_planes=4).persist()

    qids = [3, 9, 27, 41, 77]
    queries = [(i, emb_np[i].tolist()) for i in qids]
    want = {i: {r["vec_id"] for r in
                brute_force_topk(emb_df, emb_np[i].tolist(), k=10,
                                 metric="cosine").collect()}
            for i in qids}

    ivf_hits = {}
    for r in ivf_topk_batch(assigned, cents, queries, k=10,
                            nprobe=4).collect():
        ivf_hits.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf_recall = np.mean([len(ivf_hits.get(i, set()) & want[i]) / 10
                          for i in qids])

    lsh_recall = np.mean([
        len({r["vec_id"] for r in
             lsh_topk(lsh_b, emb_np[i].tolist(), k=10, n_planes=4,
                      nprobe=4).collect()} & want[i]) / 10
        for i in qids])
    assert ivf_recall >= lsh_recall - 1e-9, (ivf_recall, lsh_recall)

    # monotone in nprobe; exact at full probe
    last = -1.0
    for nprobe in (2, 8, 16):
        hits = {}
        for r in ivf_topk_batch(assigned, cents, queries, k=10,
                                nprobe=nprobe).collect():
            hits.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = np.mean([len(hits.get(i, set()) & want[i]) / 10 for i in qids])
        assert rec >= last - 1e-9
        last = rec
    assert last == 1.0
    assigned.unpersist()
    lsh_b.unpersist()


def test_filtered_ann_partial_and_full_probe(spark, tmp_path, emb_df, emb_np):
    """F1 for vectors: topk(predicate=...) scores only rows passing the
    attribute predicate. Full probe == filtered brute force (true
    oracle); partial probe results are a subset of the filtered corpus
    and keep exact cosines."""
    from pdx_spark.operators.similarity import AnnIndex

    meta = emb_df.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    idx = AnnIndex.build(meta, str(tmp_path / "fann"), n_planes=4,
                         meta_cols=("label",))
    assert idx.meta["meta_cols"] == ["label"]
    q = emb_np[3].tolist()
    pred = "label = 1"

    got = [(r["vec_id"], round(r["score"], 9))
           for r in idx.topk(q, k=10, nprobe=16, predicate=pred).collect()]
    bf = brute_force_topk(emb_df.filter(F.col("vec_id") % 3 == 1),
                          q, k=10, metric="cosine")
    want = [(r["vec_id"], round(r["score"], 9)) for r in bf.collect()]
    assert got == want

    part = idx.topk(q, k=10, nprobe=4, predicate=pred).collect()
    assert part and all(int(r["vec_id"]) % 3 == 1 for r in part)
    exact = dict(want)
    for r in part:  # any returned (id, score) matches the exact cosine
        if r["vec_id"] in exact:
            assert round(r["score"], 9) == exact[r["vec_id"]]

    # ivf flavor too, via the batch API
    ividx = AnnIndex.build_ivf(meta, str(tmp_path / "fivf"), n_clusters=8,
                               meta_cols=("label",))
    got2 = [(r["vec_id"], round(r["score"], 9))
            for r in ividx.topk_batch([(0, q)], k=10, nprobe=8,
                                      predicate=pred).collect()]
    assert got2 == want


def test_ivf_centroids_side_artifact(spark, tmp_path, emb_df, emb_np,
                                     monkeypatch):
    """Above CENTROID_INLINE_MAX the centroid matrix persists as parquet
    through the fs seam, not as manifest JSON; load() + topk are
    identical to the inline flavor."""
    import json

    import pdx_spark.operators.similarity as S

    inline = S.AnnIndex.build_ivf(emb_df, str(tmp_path / "inl"), n_clusters=8)
    monkeypatch.setattr(S, "CENTROID_INLINE_MAX", 0)
    side = S.AnnIndex.build_ivf(emb_df, str(tmp_path / "side"), n_clusters=8)
    assert "centroids" not in side.meta
    assert side.meta["centroids_file"] == "centroids"
    manifest = json.loads(open(str(tmp_path / "side" / "ann_manifest.json")).read())
    assert "centroids" not in manifest

    reloaded = S.AnnIndex.load(spark, str(tmp_path / "side"))
    assert np.allclose(reloaded._centroids(), inline._centroids())
    q = emb_np[9].tolist()
    a = [(r["vec_id"], round(r["score"], 9))
         for r in inline.topk(q, k=10, nprobe=8).collect()]
    b = [(r["vec_id"], round(r["score"], 9))
         for r in reloaded.topk(q, k=10, nprobe=8).collect()]
    assert a == b
