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


def lsh_topk_batch(bucketed: DataFrame, queries: list[tuple[int, list[float]]],
                   k: int = 10, n_planes: int = 6,
                   nprobe: int = DEFAULT_NPROBE, id_col: str = "vec_id",
                   vec_col: str = "embedding", seed: int = SEED) -> DataFrame:
    """Batched LSH cosine top-k: ONE Spark job scores every query of the
    batch — same amortization rationale as BM25 search_batch (reference
    batches its query loop too, pdx_end_to_end.cpp:100-108).

    Probe routing (query -> nprobe hamming-nearest buckets) is computed
    driver-side in numpy (Q x 2^n_planes ints — trivially cheap) and
    shipped as a broadcast (query_id, bucket) frame; the bucket equi-join
    co-locates each query with only its probed buckets' vectors, then a
    window top-k per query. -> (query_id, vec_id, score), identical rows
    to per-query lsh_topk."""
    spark = bucketed.sparkSession
    dim = len(queries[0][1])
    planes = _planes(dim, n_planes, seed)
    probe_rows, qvec_rows = [], []
    for qid, qv in queries:
        qv = [float(x) for x in qv]
        qbits = int(sum((1 << i) for i, p in enumerate(planes)
                        if float(np.dot(p, qv)) >= 0))
        for b in sorted(range(1 << n_planes),
                        key=lambda b: (bin(b ^ qbits).count("1"), b))[:nprobe]:
            probe_rows.append((int(qid), int(b)))
        qvec_rows.append((int(qid), qv, float(np.linalg.norm(qv))))
    probes = spark.createDataFrame(probe_rows, "query_id int, bucket int")
    qvecs = spark.createDataFrame(qvec_rows,
                                  "query_id int, qv array<double>, qn double")
    src = _with_vec_norm(bucketed, vec_col)
    joined = (src.join(F.broadcast(probes), "bucket")
              .join(F.broadcast(qvecs), "query_id"))
    score = _dot(F.col(vec_col), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    scored = joined.select("query_id", F.col(id_col).alias("vec_id"),
                           score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def _with_vec_norm(df: DataFrame, vec_col: str) -> DataFrame:
    """Reuse a persisted `nrm` column (written by AnnIndex._write_vectors)
    or compute it BELOW the probe join — either way the norm aggregate
    runs once per vector, never once per (query, vector) joined row."""
    if "nrm" in df.columns:
        return df
    return df.withColumn("nrm", _norm(F.col(vec_col)))


def lsh_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                     n_planes: int = 6, bands: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = SEED) -> DataFrame:
    """Scalable embedding near-dup pairs: `bands` independent hyperplane
    bucketings generate candidates (vectors sharing any band's bucket),
    exact cosine verifies — the embedding analog of minhash_lsh_pairs
    (dedup.py), replacing the O(n^2) crossJoin with shuffles keyed on
    bounded bucket ids. Reference analog: IVF bucket assignment
    (ivf_wrapper.hpp:15-38) + exact re-rank.

    Recall: identical vectors always share every bucket (equal signs), so
    exact-duplicate recall is 1.0; near-dup recall grows with `bands` and
    falls with `n_planes` (standard banded-LSH tradeoff).
    -> (id_a, id_b, cosine), id_a < id_b, cosine rounded to 6 dp."""
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    dim = _dim_of(emb, vec_col)
    band_cols = []
    for bi in range(bands):
        planes = _planes(dim, n_planes, seed + 101 * bi)
        band_cols.append(F.struct(
            F.lit(bi).alias("band"),
            lsh_bucket_col(F.col("v"), planes).alias("bucket")))
    # buckets feed both candidate join sides — persist so the per-band
    # hyperplane projections run once (slim (id, band, bucket) rows)
    buckets = (v.select("id", F.explode(F.array(*band_cols)).alias("bb"))
               .select("id", "bb.band", "bb.bucket")).persist()
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    av = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    bv = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    dot = _dot(F.col("va"), F.col("vb"))
    return (cand.join(av, "id_a").join(bv, "id_b")
            .withColumn("cosine", F.round(
                dot / (_norm(F.col("va")) * _norm(F.col("vb"))), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the schema when declared, else from one
    row (a LIMIT-1 job, not a scan)."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


# ---- IVF (learned k-means) bucketing — the reference's literal
# partitioning (clustering.hpp:28-120: sampled k-means -> centroids ->
# assign; searcher.hpp:181-215: rank centroids per query, probe nprobe).
# Same probe/verify shape as the hyperplane LSH path; buckets are
# learned instead of random, which tightens candidate sets on clustered
# corpora (higher recall at equal nprobe). ----

def ivf_train(emb: DataFrame, n_clusters: int = 64,
              vec_col: str = "embedding", seed: int = SEED,
              sample_fraction: float | None = None) -> np.ndarray:
    """K-means centroids (n_clusters x dim) via pyspark.ml — distributed
    Lloyd's, mirroring the reference's sampled training
    (clustering.hpp:46-63: trains on a sample when the corpus is large).
    At 100 TB callers pass sample_fraction to train on a bounded sample;
    assignment stays full-corpus either way."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb if sample_fraction is None else emb.sample(
        fraction=sample_fraction, seed=seed)
    vecs = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_clusters, seed=seed, initMode="k-means||") \
        .fit(vecs)
    return np.array([np.asarray(c, dtype=np.float64)
                     for c in model.clusterCenters()])


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Adds `bucket` = argmin_c ||v - centroid_c||^2, computed as an
    Arrow-batched matmul (one GEMM per batch — the PopulateIVFClusters
    analog, ivf_wrapper.hpp:15-38). No shuffle; assignment is per-row."""
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    cnorm = (cent * cent).sum(axis=1)  # ||c||^2 term; ||v||^2 constant per row
    # fresh StructType — StructType.add would MUTATE emb's cached schema
    schema = StructType(list(emb.schema.fields)
                        + [StructField("bucket", IntegerType())])

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # argmin ||v-c||^2 = argmin ||c||^2 - 2 v.c
            d = cnorm[None, :] - 2.0 * (V @ cent.T)
            pdf = pdf.copy()
            pdf["bucket"] = pd.Series(np.argmin(d, axis=1).astype("int32"),
                                      index=pdf.index)
            yield pdf

    return emb.mapInPandas(fn, schema=schema)


def ivf_topk_batch(assigned: DataFrame, centroids: np.ndarray,
                   queries: list[tuple[int, list[float]]], k: int = 10,
                   nprobe: int = DEFAULT_NPROBE, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Batched IVF cosine top-k: per query, rank centroids by L2 distance
    (the cluster-promise order, searcher.hpp:181-215) and probe the
    nearest `nprobe`; routing ships as a broadcast (query_id, bucket)
    frame; ONE job scores the whole batch. nprobe = n_clusters is
    exhaustive == brute force (the true-oracle configuration)."""
    spark = assigned.sparkSession
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    probe_rows, qvec_rows = [], []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        d = ((cent - q[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(cent)), d))[:nprobe]
        probe_rows += [(int(qid), int(b)) for b in order]
        qvec_rows.append((int(qid), [float(x) for x in q],
                          float(np.linalg.norm(q))))
    probes = spark.createDataFrame(probe_rows, "query_id int, bucket int")
    qvecs = spark.createDataFrame(qvec_rows,
                                  "query_id int, qv array<double>, qn double")
    src = _with_vec_norm(assigned, vec_col)
    joined = (src.join(F.broadcast(probes), "bucket")
              .join(F.broadcast(qvecs), "query_id"))
    score = _dot(F.col(vec_col), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    scored = joined.select("query_id", F.col(id_col).alias("vec_id"),
                           score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


# ---- persisted ANN index (save/load parity with the reference's
# index_factory.save/load, python/pdxearch/index_factory.py:47-66) ----

# centroid matrices up to this many floats inline in the JSON manifest;
# larger ones (realistic ANN: 4096 clusters x 1024 dims would be ~100 MB
# of JSON — round-3 ADVICE) persist as a parquet side artifact through
# the same fs seam
CENTROID_INLINE_MAX = 8192


class AnnIndex:
    """Bucketed ANN index persisted as an artifact: bucketed vectors
    (parquet, sorted by bucket for row-group pruning on probe filters) +
    a JSON manifest carrying (kind, dim, params, n_vectors,
    format_version). Two bucketings, one artifact format:
    kind="lsh" (random hyperplanes) and kind="ivf" (learned k-means
    centroids — the reference's literal IVF, ivf_wrapper.hpp +
    clustering.hpp; small centroid sets inline in the manifest, large
    ones in a parquet side artifact). load() -> same top-k as the
    pre-save handle. `meta_cols` at build time persists attribute
    columns next to each vector, enabling filtered search
    (`topk(..., predicate=...)` — the reference's FilteredSearch for
    vectors, index.hpp:273-280): the predicate lands in the probed
    parquet scan as a pushed filter, before any distance is computed."""

    MANIFEST = "ann_manifest.json"

    def __init__(self, spark, path: str, meta: dict):
        from pdx_spark.fs import index_fs
        self.spark = spark
        self.path = path
        self.fs = index_fs(spark, path)
        self.meta = meta

    @classmethod
    def _write_vectors(cls, spark, bucketed: DataFrame, path: str) -> int:
        """Stage + rename-commit the bucket-sorted vectors through the
        filesystem seam (same URI reach as the BM25 index: file:,
        hdfs:, s3a:, ...); returns the row count."""
        from pdx_spark.fs import IndexFS, index_fs
        fs = index_fs(spark, path)
        tmp = IndexFS.join(path, "vectors.tmp")
        # persist each vector's L2 norm once at build: the batched
        # scorers fan a vector out to every query probing its bucket,
        # and recomputing the norm per joined row costs Q aggregates
        # per vector per batch
        bucketed.withColumn("nrm", _norm(F.col("embedding"))) \
                .sortWithinPartitions("bucket") \
                .write.mode("overwrite").parquet(tmp)
        final = IndexFS.join(path, "vectors")
        fs.rename(tmp, final)
        return spark.read.parquet(final).count()

    @classmethod
    def build(cls, emb: DataFrame, path: str, n_planes: int = 6,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = SEED,
              meta_cols: tuple[str, ...] = ()) -> "AnnIndex":
        spark = emb.sparkSession
        dim = _dim_of(emb, vec_col)
        bucketed = lsh_assign(emb, dim, n_planes, vec_col, seed) \
            .select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("embedding"), "bucket",
                    *meta_cols)
        n = cls._write_vectors(spark, bucketed, path)
        meta = {"kind": "lsh", "dim": dim, "n_planes": n_planes,
                "seed": seed, "n_vectors": int(n), "metric": "cosine",
                "meta_cols": list(meta_cols), "format_version": 1}
        cls._commit_manifest(spark, path, meta)
        return cls(spark, path, meta)

    @classmethod
    def build_ivf(cls, emb: DataFrame, path: str, n_clusters: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = SEED,
                  sample_fraction: float | None = None,
                  meta_cols: tuple[str, ...] = ()) -> "AnnIndex":
        """IVF variant: learned k-means buckets (clustering.hpp:28-120).
        Centroids inline in the manifest up to CENTROID_INLINE_MAX
        floats; above that they commit as a parquet side artifact
        through the fs seam (manifest keeps only shape/params)."""
        from pdx_spark.fs import IndexFS, index_fs
        spark = emb.sparkSession
        centroids = ivf_train(emb, n_clusters, vec_col, seed, sample_fraction)
        assigned = ivf_assign(
            emb.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("embedding"), *meta_cols),
            centroids, "embedding")
        n = cls._write_vectors(spark, assigned, path)
        meta = {"kind": "ivf", "dim": int(centroids.shape[1]),
                "n_clusters": int(n_clusters), "seed": seed,
                "n_vectors": int(n), "metric": "cosine",
                "meta_cols": list(meta_cols), "format_version": 1}
        if centroids.size <= CENTROID_INLINE_MAX:
            meta["centroids"] = [[float(x) for x in c] for c in centroids]
        else:
            fs = index_fs(spark, path)
            tmp = IndexFS.join(path, "centroids.tmp")
            spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
                "cluster int, vec array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            fs.rename(tmp, IndexFS.join(path, "centroids"))
            meta["centroids_file"] = "centroids"
        cls._commit_manifest(spark, path, meta)
        return cls(spark, path, meta)

    @staticmethod
    def _commit_manifest(spark, path: str, meta: dict) -> None:
        import json

        from pdx_spark.fs import IndexFS, index_fs
        index_fs(spark, path).write_text_atomic(
            IndexFS.join(path, AnnIndex.MANIFEST),
            json.dumps(meta, indent=1, sort_keys=True))

    @classmethod
    def load(cls, spark, path: str) -> "AnnIndex":
        import json

        from pdx_spark.fs import IndexFS, index_fs
        meta = json.loads(index_fs(spark, path).read_text(
            IndexFS.join(path, cls.MANIFEST)))
        return cls(spark, path, meta)

    def vectors(self) -> DataFrame:
        from pdx_spark.fs import IndexFS
        return self.spark.read.parquet(IndexFS.join(self.path, "vectors"))

    def _centroids(self) -> np.ndarray:
        if "centroids" in self.meta:
            return np.array(self.meta["centroids"], dtype=np.float64)
        from pdx_spark.fs import IndexFS
        rows = (self.spark.read.parquet(
            IndexFS.join(self.path, self.meta["centroids_file"]))
            .orderBy("cluster").collect())
        return np.array([list(r["vec"]) for r in rows], dtype=np.float64)

    def _probe_frame(self, predicate: str | None) -> DataFrame:
        """Vectors with the attribute predicate applied BEFORE scoring —
        the selection-vector analog for ANN (F1/F2 for vectors). The
        filter composes with the probe's bucket filter, so both land as
        pushed filters in the one parquet scan; exactness: scoring a
        subset can only remove candidates, never change a kept score."""
        v = self.vectors()
        return v.filter(F.expr(predicate)) if predicate else v

    def topk(self, query_vec: list[float], k: int = 10,
             nprobe: int = DEFAULT_NPROBE,
             predicate: str | None = None) -> DataFrame:
        v = self._probe_frame(predicate)
        if self.meta.get("kind", "lsh") == "ivf":
            res = ivf_topk_batch(v, self._centroids(),
                                 [(0, query_vec)], k, nprobe)
            return res.select("vec_id", "score")
        return lsh_topk(v, query_vec, k,
                        self.meta["n_planes"], nprobe, seed=self.meta["seed"])

    def topk_batch(self, queries: list[tuple[int, list[float]]], k: int = 10,
                   nprobe: int = DEFAULT_NPROBE,
                   predicate: str | None = None) -> DataFrame:
        v = self._probe_frame(predicate)
        if self.meta.get("kind", "lsh") == "ivf":
            return ivf_topk_batch(v, self._centroids(),
                                  queries, k, nprobe)
        return lsh_topk_batch(v, queries, k,
                              self.meta["n_planes"], nprobe,
                              seed=self.meta["seed"])
