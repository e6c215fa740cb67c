"""Vector similarity search over an embedding column — the reference's
literal domain (IVF cosine/L2 top-k, /root/reference/include/pdx/
ivf_wrapper.hpp, searcher.hpp), carried over as a second payload next to
BM25:

  brute_force_topk — exact cosine/L2/IP top-k, pure Column expressions
                     (zip_with + aggregate dot products; Catalyst plans
                     the global top-k as TakeOrderedAndProject — the
                     same distributed-heap algorithm as the reference's
                     per-cluster heaps + merge, searcher.hpp:542-585).
  lsh_assign / lsh_topk — random-hyperplane LSH buckets (deterministic,
                     md5-seeded planes): the scale path; probes the
                     query's bucket + nprobe hamming-nearest buckets,
                     mirroring IVF's nprobe centroid ranking
                     (searcher.hpp:181-215).

Metric conventions follow the reference (common.hpp:74): l2sq, ip,
cosine; cosine == IP on normalized vectors (common.hpp:201-206).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark.config import SEED

DEFAULT_NPROBE = 8  # reference: DEFAULT_NPROBE=32 at 2^? buckets; ours 2^n_planes


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                     metric: str = "cosine", id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: -> (vec_id, score) sorted best-first, ties by id.
    score = cosine/ip (higher better) or negative l2sq (higher better) —
    one orientation so orderBy(desc) is uniform."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    if metric == "cosine":
        score = _dot(v, q) / (_norm(v) * F.lit(float(np.linalg.norm(query_vec))))
    elif metric == "ip":
        score = _dot(v, q)
    elif metric == "l2sq":
        score = -F.aggregate(F.zip_with(v, q, lambda x, y:
                                        (x.cast("double") - y) * (x.cast("double") - y)),
                             F.lit(0.0), lambda acc, x: acc + x)
    else:
        raise ValueError(metric)
    return (emb.select(F.col(id_col).alias("vec_id"), score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id")).limit(k))


# ---- LSH (random hyperplane) bucketing — the approximate scale path ----

def _planes(dim: int, n_planes: int, seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Signed-projection bucket id: bit i = sign(v . plane_i)."""
    terms = []
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec_col,
                       F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        terms.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def lsh_assign(emb: DataFrame, dim: int, n_planes: int = 6,
               vec_col: str = "embedding", seed: int = SEED) -> DataFrame:
    """Adds a `bucket` column. Persist this once (the 'index build');
    repartition by bucket co-locates each bucket's vectors."""
    return emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col),
                                                   _planes(dim, n_planes, seed)))


def lsh_topk(bucketed: DataFrame, query_vec: list[float], k: int = 10,
             n_planes: int = 6, nprobe: int = DEFAULT_NPROBE,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = SEED) -> DataFrame:
    """Approximate cosine top-k scanning only the nprobe buckets whose ids
    are hamming-closest to the query's bucket (probe order = PDX's
    centroid ranking). Recall grows with nprobe; nprobe=2^n_planes is
    exhaustive == brute force."""
    planes = _planes(len(query_vec), n_planes, seed)
    qbits = int(sum((1 << i) for i, p in enumerate(planes)
                    if float(np.dot(p, query_vec)) >= 0))
    buckets = sorted(range(1 << n_planes),
                     key=lambda b: (bin(b ^ qbits).count("1"), b))[:nprobe]
    probed = bucketed.filter(F.col("bucket").isin(buckets))
    return brute_force_topk(probed, query_vec, k, "cosine", id_col, vec_col)
