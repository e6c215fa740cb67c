"""Driver contract for the spark-graft builder (PySpark target).

Maps the pdx_spark engine + pipeline operators onto the driver's
verify harness: each queries() entry has a DuckDB-runnable oracle_sql()
twin (same column names, floats rounded identically) unless the op is
approximate/stubbed, in which case the oracle is omitted (rows-only
check) and the pytest suite carries the exactness evidence instead.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pdx_spark.schemas as schemas
from pdx_spark.config import BM25Params, IndexConfig

BM25 = BM25Params()

# Fixed flagship query set over the `documents` vocabulary.
DOC_QUERY = "spark window batch"
DOC_QUERY_2 = "hash join table"
TRANS_QUERY = "w0003 w0150"

# ---------------------------------------------------------------------------
# shared: index build cache (one engine index per sf_dir per process)
# ---------------------------------------------------------------------------

_IDX_CACHE: dict[str, str] = {}


def _documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> transcripts shape. conv_id = zero-padded doc_id keeps
    (conv_id, turn_idx) order == doc_id order, so engine dense doc_ids
    equal the original documents.doc_id (dense 0..N-1 in the fixtures).
    role := lang and tool := source so filtered search predicates map to
    SQL WHERE clauses on the original columns."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("lang").alias("role"),
        F.col("text"),
        F.col("source").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"))


def _index_for(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IDX_CACHE:
        from pdx_spark.operators.indexer import Indexer
        cfg = IndexConfig(block_size=64, docs_per_shard=256)
        path = os.path.join(
            tempfile.gettempdir(),
            f"pdx_entry_idx_v{cfg.format_version}_b{cfg.block_size}"
            f"_s{cfg.docs_per_shard}_" + sf_dir.strip("/").replace("/", "_"))
        if not os.path.exists(os.path.join(path, "manifest.json")):
            Indexer(spark, cfg=cfg).build(_documents_as_transcripts(spark, sf_dir),
                                          path, n_chunks=1)
        _IDX_CACHE[sf_dir] = path
    return _IDX_CACHE[sf_dir]


def _searcher(spark, sf_dir):
    from pdx_spark.operators.searcher import Searcher
    return Searcher.load(spark, _index_for(spark, sf_dir))


def _as_orig_doc_id(searcher, results: DataFrame) -> DataFrame:
    """engine doc_id == original doc_id by construction; keep the join
    anyway (self-documenting + correct even if ids ever stop being dense)."""
    return (results.join(searcher.docs().select("doc_id", "conv_id"), "doc_id")
            .select(F.col("conv_id").cast("bigint").alias("doc_id"),
                    F.round(F.col("score"), 4).alias("score")))


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _dup_corpus(spark, sf_dir):
    """documents plus a shifted copy of every 10th doc — guarantees known
    duplicate pairs for the dedup oracles (fixtures have no natural dups).
    The shift is max(doc_id)+1, NOT a constant, so copies can never
    collide with real ids at any fixture scale."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    off = int(d.agg(F.max("doc_id")).collect()[0][0]) + 1
    copy = (d.filter(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + off).alias("doc_id"), "text"))
    return d.unionByName(copy)


# SQL twin of _dup_corpus (DuckDB; `documents` is a pre-registered view).
# The scalar subquery computes the same collision-proof offset.
_DUP_SQL = ("(SELECT doc_id, text FROM documents "
            "UNION ALL SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)"
            " AS doc_id, text FROM documents WHERE doc_id % 10 = 0)")

# Tokenizer twins.
_TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_MD5LONG = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _bm25_sql(query_terms: list[str], k: int, where: str = "TRUE",
              src: str = "documents") -> str:
    """Exact BM25 top-k in ANSI SQL (DuckDB dialect) — FIXTURES.md §7.

    `where` restricts the CANDIDATE set only; corpus statistics (N,
    avgdl, df) stay global — filtered-search semantics match the
    reference's selection vectors (index stats are never recomputed
    per predicate, index.hpp:273-280)."""
    terms = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
WITH corpus AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM {src}
),
docs AS (SELECT doc_id, len(toks) AS dl, toks FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
qterms(term) AS (VALUES {terms}),
tf AS (
  SELECT d.doc_id, d.dl, u.t AS term, count(*) AS tf
  FROM docs d, unnest(d.toks) AS u(t)
  WHERE u.t IN (SELECT term FROM qterms)
  GROUP BY 1, 2, 3
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * {BM25.k1 + 1.0})
             / (tf.tf + {BM25.k1} * (1.0 - {BM25.b} + {BM25.b} * tf.dl / s.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE doc_id IN (SELECT doc_id FROM {src} WHERE {where})
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# entry — driver smoke check (flagship query at sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pruned block-max BM25 top-10 over sf0.001 documents."""
    sf_dir = "/root/testdata/sf0.001"
    s = _searcher(spark, sf_dir)
    res = s.search_batch([(0, DOC_QUERY, 10)])
    return _as_orig_doc_id(s, res)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def q_bm25_exact(spark, sf_dir):
    """Exhaustive DataFrame-only BM25 (no index) — operators/exact.py."""
    from pdx_spark.functions.tokenize import tokens_col
    from pdx_spark.operators import corpus as C
    from pdx_spark.operators.exact import exact_topk
    ids = _docs(spark, sf_dir).select("doc_id", "text")
    posts = C.postings(ids)
    dl = ids.select(F.size(tokens_col(F.col("text"))).alias("dl"))
    row = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    n, avgdl = int(row["n"]), float(row["a"])
    ts = C.term_stats(posts, n, avgdl, BM25)
    res = exact_topk(posts, ts, n, avgdl, BM25, [(0, DOC_QUERY, 10)])
    return res.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_pruned(spark, sf_dir):
    """Full engine: blocked segments + θ-seeded block-max pruned scan."""
    s = _searcher(spark, sf_dir)
    return _as_orig_doc_id(s, s.search_batch([(0, DOC_QUERY, 10)]))


def q_bm25_pruned_multi(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    res = s.search_batch([(0, DOC_QUERY, 10), (1, DOC_QUERY_2, 10)])
    out = (res.join(s.docs().select("doc_id", "conv_id"), "doc_id")
           .select("query_id",
                   F.col("conv_id").cast("bigint").alias("doc_id"),
                   F.round(F.col("score"), 4).alias("score")))
    return out


def q_bm25_filtered(spark, sf_dir):
    """Filtered search: predicate lang='en' (role carries lang)."""
    s = _searcher(spark, sf_dir)
    res = s.search_batch([(0, DOC_QUERY, 10)], predicate="role = 'en'")
    return _as_orig_doc_id(s, res)


def q_corpus_stats(spark, sf_dir):
    from pdx_spark.operators.searcher import Searcher
    s = _searcher(spark, sf_dir)
    return spark.createDataFrame(
        [(int(s.n_docs), float(round(s.avgdl, 6)))], "n_docs bigint, avgdl double")


def q_term_stats(spark, sf_dir):
    """Top-20 terms by document frequency (ties: term asc) from the
    persisted term_stats table."""
    s = _searcher(spark, sf_dir)
    return (s.term_stats()
            .orderBy(F.desc("df"), F.asc("term")).limit(20)
            .select("term", F.col("df").cast("bigint").alias("df"),
                    F.col("max_tf").cast("bigint").alias("max_tf")))


def q_postings(spark, sf_dir):
    """Decoded posting list of one term — exercises block decode round-trip."""
    from pdx_spark.operators.maintenance import _decode_segments_to_postings
    s = _searcher(spark, sf_dir)
    seg = s.segments().filter(F.col("term") == "spark")
    posts = _decode_segments_to_postings(seg)
    return (posts.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                         F.col("tf").cast("bigint").alias("tf"),
                         F.col("dl").cast("bigint").alias("dl"))
            .orderBy("doc_id"))


def q_dedup_exact_norm(spark, sf_dir):
    """Normalization-tolerant exact dedup: case/whitespace variants of
    every 7th doc are planted, so normalize=True must group them."""
    from pdx_spark.operators.dedup import exact_dup_groups
    d = _docs(spark, sf_dir).select("doc_id", "text")
    off = int(d.agg(F.max("doc_id")).collect()[0][0]) + 1
    variant = (d.filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + off).alias("doc_id"),
                       F.concat(F.upper("text"), F.lit("  ")).alias("text")))
    both = d.unionByName(variant)
    return (exact_dup_groups(both, normalize=True)
            .select("text_md5", "n_dups", "canonical_doc_id"))


def q_dedup_drop_list(spark, sf_dir):
    """Greedy dedup resolution over the MinHash-LSH verified pairs."""
    from pdx_spark.operators.dedup import dedup_drop_list, minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_dup_corpus(spark, sf_dir), n=3,
                              num_hashes=16, bands=4, threshold=0.5)
    return (dedup_drop_list(pairs)
            .select(F.col("drop_id").cast("bigint").alias("drop_id")))


def q_dedup_exact(spark, sf_dir):
    from pdx_spark.operators.dedup import exact_dup_groups
    return (exact_dup_groups(_dup_corpus(spark, sf_dir))
            .select("text_md5", F.col("n_dups").cast("bigint").alias("n_dups"),
                    F.col("canonical_doc_id").cast("bigint")
                    .alias("canonical_doc_id")))


def q_dedup_jaccard(spark, sf_dir):
    from pdx_spark.operators.dedup import ngram_jaccard_pairs
    return (ngram_jaccard_pairs(_dup_corpus(spark, sf_dir), n=3, threshold=0.8)
            .select(F.col("doc_a").cast("bigint").alias("doc_a"),
                    F.col("doc_b").cast("bigint").alias("doc_b"), "jaccard"))


def q_dedup_minhash(spark, sf_dir):
    """MinHash signatures (first 4 of 16 hash fns as columns)."""
    from pdx_spark.operators.dedup import minhash_signatures
    sig = minhash_signatures(_dup_corpus(spark, sf_dir), n=3, num_hashes=16)
    return sig.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.element_at("sig", 1).alias("m0"), F.element_at("sig", 2).alias("m1"),
        F.element_at("sig", 3).alias("m2"), F.element_at("sig", 4).alias("m3"))


def q_dedup_minhash_pairs(spark, sf_dir):
    from pdx_spark.operators.dedup import minhash_lsh_pairs
    return (minhash_lsh_pairs(_dup_corpus(spark, sf_dir), n=3, num_hashes=16,
                              bands=4, threshold=0.5)
            .select(F.col("doc_a").cast("bigint").alias("doc_a"),
                    F.col("doc_b").cast("bigint").alias("doc_b"), "jaccard"))


def q_dedup_simhash(spark, sf_dir):
    from pdx_spark.operators.dedup import simhash63
    return (simhash63(_docs(spark, sf_dir).select("doc_id", "text"))
            .select(F.col("doc_id").cast("bigint").alias("doc_id"), "simhash"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming<=3). Approx banding is exact for
    <=3 over 4 bands (pigeonhole) => SQL oracle provided via direct
    all-pairs popcount."""
    from pdx_spark.operators.dedup import simhash_near_dup_pairs
    return (simhash_near_dup_pairs(_dup_corpus(spark, sf_dir), max_hamming=3)
            .select(F.col("doc_a").cast("bigint").alias("doc_a"),
                    F.col("doc_b").cast("bigint").alias("doc_b"),
                    F.col("hamming").cast("bigint").alias("hamming")))


def _dup_embeddings(spark, sf_dir):
    """embeddings plus a shifted copy of every 25th vector (offset =
    max(vec_id)+1 — collision-proof at any scale)."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    off = int(e.agg(F.max("vec_id")).collect()[0][0]) + 1
    dup = e.filter(F.col("vec_id") % 25 == 0) \
           .select((F.col("vec_id") + off).alias("vec_id"), "embedding")
    return e.unionByName(dup)


_DUP_EMB_SQL = ("(SELECT vec_id, embedding FROM embeddings "
                "UNION ALL SELECT vec_id + (SELECT max(vec_id) + 1 "
                "FROM embeddings) AS vec_id, embedding "
                "FROM embeddings WHERE vec_id % 25 = 0)")


def q_dedup_embedding(spark, sf_dir):
    """Exact all-pairs verification yardstick (small-partition use only;
    the scale path is q_dedup_embedding_lsh)."""
    from pdx_spark.operators.dedup import embedding_cosine_pairs
    both = _dup_embeddings(spark, sf_dir)
    return (embedding_cosine_pairs(both, threshold=0.999)
            .select(F.col("id_a").cast("bigint").alias("id_a"),
                    F.col("id_b").cast("bigint").alias("id_b"), "cosine"))


def q_dedup_embedding_lsh(spark, sf_dir):
    """Scalable embedding near-dup: banded hyperplane-LSH candidates +
    exact cosine verify (no crossJoin anywhere in the plan). Oracle is
    the exact all-pairs SQL: identical vectors share every LSH bucket, so
    at threshold 0.999 (exact-copy territory on these fixtures) the
    candidate set has full recall and the verified pairs match exactly."""
    from pdx_spark.operators.similarity import lsh_cosine_pairs
    both = _dup_embeddings(spark, sf_dir)
    return (lsh_cosine_pairs(both, threshold=0.999, n_planes=6, bands=4,
                             id_col="vec_id", vec_col="embedding")
            .select(F.col("id_a").cast("bigint").alias("id_a"),
                    F.col("id_b").cast("bigint").alias("id_b"), "cosine"))


def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-10 to the vec_id=0 embedding."""
    from pdx_spark.operators.similarity import brute_force_topk
    e = _emb(spark, sf_dir)
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    res = brute_force_topk(e, list(qvec), k=10, metric="cosine")
    return res.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.round("score", 6).alias("cosine"))


_ANN_IDX_CACHE: dict = {}


def _ann_index(spark, sf_dir):
    """Build-once (per sf_dir) persisted ANN index — the save/load path is
    part of what the ann_lsh entries exercise."""
    import tempfile

    from pdx_spark.operators.similarity import AnnIndex
    if sf_dir not in _ANN_IDX_CACHE:
        path = os.path.join(tempfile.gettempdir(),
                            "pdx_ann_" + sf_dir.strip("/").replace("/", "_"))
        AnnIndex.build(_emb(spark, sf_dir), path, n_planes=6,
                       meta_cols=("label",))
        _ANN_IDX_CACHE[sf_dir] = path
    return AnnIndex.load(spark, _ANN_IDX_CACHE[sf_dir])


def q_ann_lsh(spark, sf_dir):
    """Persisted LSH index, FULL probe (nprobe=2^n_planes scans every
    bucket) — provably identical to brute force, so the exact-cosine SQL
    is a true oracle for the whole bucket/probe/save-load machinery.
    Partial-probe recall is pytest-gated (tests/test_similarity.py)."""
    idx = _ann_index(spark, sf_dir)
    qvec = list(idx.vectors().filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0])
    res = idx.topk(qvec, k=10, nprobe=64)
    return res.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.round("score", 6).alias("cosine"))


def q_ann_ivf(spark, sf_dir):
    """Persisted IVF (learned k-means buckets) index, FULL probe
    (nprobe=n_clusters) — provably identical to brute force, so the
    exact-cosine SQL is a true oracle for the train/assign/probe/
    save-load machinery (reference clustering.hpp + ivf_wrapper.hpp).
    Partial-probe recall vs LSH is pytest-gated
    (tests/test_similarity.py)."""
    import tempfile

    from pdx_spark.operators.similarity import AnnIndex
    key = ("ivf", sf_dir)
    if key not in _ANN_IDX_CACHE:
        path = os.path.join(tempfile.gettempdir(),
                            "pdx_ivf_" + sf_dir.strip("/").replace("/", "_"))
        AnnIndex.build_ivf(_emb(spark, sf_dir), path, n_clusters=16)
        _ANN_IDX_CACHE[key] = path
    idx = AnnIndex.load(spark, _ANN_IDX_CACHE[key])
    qvec = list(idx.vectors().filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0])
    res = idx.topk(qvec, k=10, nprobe=16)
    return res.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.round("score", 6).alias("cosine"))


def q_ann_filtered(spark, sf_dir):
    """FilteredSearch over vectors (reference F1 applied to its literal
    domain, index.hpp:273-280): attribute predicate evaluated BEFORE
    scoring, pushed into the probed parquet scan. Full probe ==> the
    WHERE-clause exact-cosine SQL is a true oracle."""
    idx = _ann_index(spark, sf_dir)
    qvec = list(idx.vectors().filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0])
    res = idx.topk(qvec, k=10, nprobe=64, predicate="label % 2 = 1")
    return res.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.round("score", 6).alias("cosine"))


def q_ann_lsh_batch(spark, sf_dir):
    """Batched LSH top-k (one Spark job for the whole query batch) at full
    probe — oracle is per-query exact top-10 UNION ALL."""
    idx = _ann_index(spark, sf_dir)
    qrows = (idx.vectors().filter(F.col("vec_id").isin([0, 1, 2]))
             .select("vec_id", "embedding").collect())
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    res = idx.topk_batch(queries, k=10, nprobe=64)
    return res.select(F.col("query_id").cast("int").alias("query_id"),
                      F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.round("score", 6).alias("cosine"))


def q_text_stats(spark, sf_dir):
    from pdx_spark.functions import textstats as X
    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        X.ws_token_count(F.col("text")).cast("bigint").alias("ws_tokens"),
        X.regex_token_count(F.col("text")).cast("bigint").alias("re_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.round(X.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(X.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"))


def q_text_quality(spark, sf_dir):
    from pdx_spark.functions import textstats as X
    d = _docs(spark, sf_dir)
    return d.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    X.quality_score(F.col("text")).alias("quality"))


def q_lang_id(spark, sf_dir):
    from pdx_spark.functions import textstats as X
    d = _docs(spark, sf_dir)
    return d.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    X.lang_guess(F.col("text")).alias("lang_guess"))


def q_fingerprint(spark, sf_dir):
    from pdx_spark.functions import textstats as X
    d = _docs(spark, sf_dir)
    return d.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    X.fingerprint(F.col("text")).alias("fp"))


def q_events_windowed(spark, sf_dir):
    """Tumbling 1h window counts per event_type (streaming-equivalent
    batch form; the streaming variant is pdx_spark.streaming.ingest)."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"),
                       "event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (30 min) per user: session count + avg len."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (ev.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1)
                          .otherwise(0))
            .withColumn("sid", F.sum("new_s").over(
                w.rowsBetween(W.unboundedPreceding, 0))))
    per = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n_events"))
    return (per.groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_sessions"),
                 F.round(F.avg("n_events"), 6).alias("avg_events"))
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    "n_sessions", "avg_events"))


def q_events_sessions_stateful(spark, sf_dir):
    """CLOSED sessions from the applyInPandasWithState streaming
    sessionizer (availableNow over the events fixture). Oracle: batch
    gap-sessionization minus each user's final (still-open) session —
    exactly what append-mode state emits."""
    import tempfile

    from pdx_spark.streaming.sessions import sessionize_stream
    src_file = os.path.join(sf_dir, "events.parquet")
    ev_schema = spark.read.parquet(src_file).schema
    # readStream needs a DIRECTORY source; the fixture is a single file
    stream_dir = tempfile.mkdtemp(prefix="ev_stream_")
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.abspath(src_file), link)
    src = spark.readStream.schema(ev_schema).parquet(stream_dir)
    name = "sess_stateful_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    q = (sessionize_stream(src, gap_sec=1800)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    "session_start", "session_end",
                    F.col("n_events").cast("bigint").alias("n_events")))


def q_tpch_pricing(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4).alias("revenue"),
                 F.count("*").cast("bigint").alias("n_rows")))


def q_top_customers(spark, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return (o.groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 4).alias("total"),
                 F.count("*").cast("bigint").alias("n_orders"))
            .join(F.broadcast(c.select("c_custkey", "c_name")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "total", "n_orders")
            .orderBy(F.desc("total"), F.asc("c_name")).limit(10))


def _transcripts_fixture_path() -> str:
    from pdx_spark.sources.fixtures import transcripts_path
    return transcripts_path("small")


_TIDX_CACHE: dict[str, str] = {}


def _transcripts_searcher(spark):
    """Engine index over the deterministic transcripts fixture (seed 42,
    ~8k turns) — the north-rule corpus shape end-to-end."""
    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS
    p = _transcripts_fixture_path()
    if p not in _TIDX_CACHE:
        cfg = IndexConfig(block_size=64, docs_per_shard=512)
        path = os.path.join(tempfile.gettempdir(),
                            f"pdx_entry_tidx_v{cfg.format_version}"
                            f"_b{cfg.block_size}_s{cfg.docs_per_shard}")
        if not os.path.exists(os.path.join(path, "manifest.json")):
            df = spark.read.schema(TRANSCRIPTS).parquet(p)
            Indexer(spark, cfg=cfg).build(df, path, n_chunks=2)
        _TIDX_CACHE[p] = path
    return Searcher.load(spark, _TIDX_CACHE[p])


def q_transcripts_bm25(spark, sf_dir):
    """Pruned engine over the transcripts fixture; oracle recomputes BM25
    in SQL over the same parquet with doc_id = dense (conv_id, turn_idx)
    rank — validates id assignment + tokenize + stats + blocks + WAND."""
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, TRANS_QUERY, 10)], two_phase_min_shards=2, force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx", F.round("score", 4).alias("score")))


def q_transcripts_filtered(spark, sf_dir):
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, "w0001 w0050", 10)],
                         predicate="role = 'assistant'",
                         two_phase_min_shards=2, force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx", F.round("score", 4).alias("score")))


# fielded serving: constant per-role score multipliers (upweight
# assistant turns, downweight tool output dumps — the transcript
# corpus's spam axis). Constant-within-role is what makes the
# composition below EXACT.
ROLE_BOOST = {"assistant": 1.5, "user": 1.0, "system": 0.75,
              "tool": 0.25}


def q_transcripts_role_boosted(spark, sf_dir):
    """BM25 x per-role weight, served as a composition of the engine's
    filtered searches: within a role the weight is a constant, so the
    global weighted top-k is contained in the union of the per-role
    (predicate-filtered) top-k's — R bounded searches, no scorer
    change, exact. The oracle recomputes the weighted ranking from the
    raw parquet in SQL."""
    from functools import reduce

    from pyspark.sql import Window
    s = _transcripts_searcher(spark)
    parts = []
    for role, w in ROLE_BOOST.items():
        res = s.search_batch([(0, TRANS_QUERY, 10)],
                             predicate=f"role = '{role}'",
                             two_phase_min_shards=2)
        parts.append(res.select(
            "doc_id", (F.col("score") * F.lit(w)).alias("wscore")))
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    win = Window.orderBy(F.desc("wscore"), F.asc("doc_id"))
    top = (allp.withColumn("_rn", F.row_number().over(win))
           .filter(F.col("_rn") <= 10).drop("_rn"))
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(top).join(keys, "doc_id")
            .select("conv_id", "turn_idx",
                    F.round("wscore", 4).alias("score")))


def q_transcripts_snippets(spark, sf_dir):
    """Serving-side snippet/highlight generation: the index stores NO
    text (correct at 100 TB — text lives in the source table), so
    snippets come from joining the top-k hits back to the source
    parquet on the stable (conv_id, turn_idx) key and slicing a fixed
    window around the first query-term occurrence, all in JVM string
    expressions (no UDF). Deterministic spec shared with the oracle:
    pos = first occurrence of the first query term present (query
    order), snippet = substring(text, max(1, pos-20), 60)."""
    from pdx_spark.schemas import TRANSCRIPTS
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, TRANS_QUERY, 10)], two_phase_min_shards=2,
                         force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    src = (spark.read.schema(TRANSCRIPTS)
           .parquet(_transcripts_fixture_path())
           .select("conv_id", "turn_idx", "text"))
    small = F.broadcast(res).join(keys, "doc_id")
    # big source streams, tiny hit set broadcasts (at 10^12 turns the
    # source side must never shuffle)
    hits = src.join(F.broadcast(small), ["conv_id", "turn_idx"])
    terms = TRANS_QUERY.split()
    pos = F.lit(1)
    for t in reversed(terms):  # first term present, in query order
        p = F.instr(F.lower("text"), t.lower())
        pos = F.when(p > 0, p).otherwise(pos)
    return (hits.withColumn("_pos", pos)
            .select("conv_id", "turn_idx",
                    F.round("score", 4).alias("score"),
                    F.expr("substring(text, greatest(1, _pos - 20), 60)")
                    .alias("snippet")))


def q_transcripts_bm25_and(spark, sf_dir):
    """Conjunctive (AND) top-k: docs must contain EVERY query term,
    ranked by the same BM25. Engine-native (require_all_terms=True:
    per-shard match counting in the scorer, conjunctive shard-
    intersection in the two-phase router); oracle = HAVING
    count(matched terms) = n over the same SQL scoring."""
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, TRANS_QUERY, 10)], require_all_terms=True,
                         two_phase_min_shards=2, force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx",
                    F.round("score", 4).alias("score")))


TRANS_QUERY_3 = "w0003 w0150 w0555"
# deterministic in-fixture trigram (first three tokens of doc 0; matches
# 3 docs at the fixture seed — the phrase entry asserts exact scoring,
# not fixture luck)
TRANS_PHRASE = "w0233 w0000 w0001"

_TIDX_POS_CACHE: dict[str, str] = {}


def _transcripts_searcher_pos(spark):
    """Positions-enabled twin of _transcripts_searcher (phrase search
    needs the optional positional side artifact)."""
    from pdx_spark.operators.indexer import Indexer
    from pdx_spark.operators.searcher import Searcher
    from pdx_spark.schemas import TRANSCRIPTS
    p = _transcripts_fixture_path()
    if p not in _TIDX_POS_CACHE:
        cfg = IndexConfig(block_size=64, docs_per_shard=512)
        path = os.path.join(tempfile.gettempdir(),
                            f"pdx_entry_tidx_pos_v{cfg.format_version}"
                            f"_b{cfg.block_size}_s{cfg.docs_per_shard}")
        if not os.path.exists(os.path.join(path, "manifest.json")):
            df = spark.read.schema(TRANSCRIPTS).parquet(p)
            Indexer(spark, cfg=cfg).build(df, path, store_positions=True)
        _TIDX_POS_CACHE[p] = path
    return Searcher.load(spark, _TIDX_POS_CACHE[p])


def q_transcripts_phrase(spark, sf_dir):
    """Exact-phrase top-k (adjacent tokens, in order) over the optional
    positional artifact: shifted position lists intersected JVM-side,
    phrase-unit BM25 (idf of the phrase df x tfnorm of the phrase tf).
    Oracle recomputes phrase tf with a list lambda over the token
    arrays."""
    from pdx_spark.operators.phrase import phrase_topk
    s = _transcripts_searcher_pos(spark)
    res = phrase_topk(s, TRANS_PHRASE, k=10)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx",
                    F.round("score", 4).alias("score")))


def q_transcripts_bm25_msm(spark, sf_dir):
    """minimum_should_match (m-of-n) top-k: docs matching >= 2 of the 3
    query terms, ranked by the same BM25 — the Lucene msm analog,
    served by the scorer's match-count gate."""
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, TRANS_QUERY_3, 10)], min_should_match=2,
                         two_phase_min_shards=2, force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx",
                    F.round("score", 4).alias("score")))


TRANS_PREFIX = "w012"


def q_transcripts_prefix(spark, sf_dir):
    """Prefix/wildcard query: expand the prefix against the term-sorted
    vocabulary (pyarrow range read on term_stats), score the expansion
    as a BM25 OR — Lucene's scoring-BooleanQuery rewrite. Oracle derives
    the same term set with LIKE over the tokenized corpus."""
    s = _transcripts_searcher(spark)
    terms = s.expand_prefix(TRANS_PREFIX, cap=64)
    res = s.search_batch([(0, " ".join(terms), 10)],
                         two_phase_min_shards=2, force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id", "turn_idx")
    return (F.broadcast(res).join(keys, "doc_id")
            .select("conv_id", "turn_idx",
                    F.round("score", 4).alias("score")))


def q_transcripts_conv_rank(spark, sf_dir):
    """Conversation-level retrieval: rank CONVERSATIONS by their best-
    matching turn (max-aggregation over turn BM25). Exact by coverage:
    conv maxima order like their best turns' first occurrences in the
    global turn ranking, so if the turn-level top-T spans >= 10
    distinct conv_ids, the first 10 distinct convs in turn order ARE
    the true conv top-10 (any unretrieved turn scores below all of
    them). T=100 over ~9-turn conversations gives wide margin; the
    oracle aggregates over ALL turns as ground truth."""
    s = _transcripts_searcher(spark)
    res = s.search_batch([(0, TRANS_QUERY, 100)], two_phase_min_shards=2,
                         force_two_phase=True)
    keys = s.docs().select("doc_id", "conv_id")
    conv = (F.broadcast(res).join(keys, "doc_id")
            .groupBy("conv_id").agg(F.max("score").alias("best")))
    return (conv.orderBy(F.desc("best"), F.asc("conv_id")).limit(10)
            .select("conv_id", F.round("best", 4).alias("score")))


def q_transcripts_roundtrip(spark, sf_dir):
    """Per-turn invariant (input_hint): stable (conv_id, turn_idx)
    ordering with dense doc_id and correct per-turn token length."""
    s = _transcripts_searcher(spark)
    return (s.docs()
            .select("doc_id", "conv_id", "turn_idx",
                    F.col("dl").cast("bigint").alias("dl")))


def q_block_layout(spark, sf_dir):
    """Structural oracle of the PDX-layout analog: block metadata
    (first/last doc, n, max_tf, min_dl) for every block of two terms,
    recomputed independently in SQL from the raw corpus. Any drift in
    sharding, block chunking, ordering, or tf counting breaks this."""
    s = _searcher(spark, sf_dir)
    seg = s.segments().filter(F.col("term").isin(["spark", "data"]))
    return seg.select(
        "term", F.col("shard").cast("bigint").alias("shard"),
        F.col("block_id").cast("bigint").alias("block_id"),
        F.col("n").cast("bigint").alias("n"),
        "first_doc", "last_doc",
        F.col("max_tf").cast("bigint").alias("max_tf"),
        F.col("min_dl").cast("bigint").alias("min_dl"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing (stubbed decode — rows-only check)."""
    from pdx_spark.operators.multimodal import extract_features, synthesize_media
    media = synthesize_media(spark, n=128)
    f = extract_features(media)
    return f.select(F.col("media_id").cast("bigint").alias("media_id"),
                    "kind", F.col("n_bytes").cast("bigint").alias("n_bytes"),
                    F.round(F.element_at("features", 1).cast("double"), 6)
                    .alias("f0"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_exact": q_bm25_exact,
        "bm25_pruned": q_bm25_pruned,
        "bm25_pruned_multi": q_bm25_pruned_multi,
        "bm25_filtered": q_bm25_filtered,
        "corpus_stats": q_corpus_stats,
        "term_stats": q_term_stats,
        "postings": q_postings,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_norm": q_dedup_exact_norm,
        "dedup_drop_list": q_dedup_drop_list,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_filtered": q_ann_filtered,
        "ann_lsh_batch": q_ann_lsh_batch,
        "text_stats": q_text_stats,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "events_windowed": q_events_windowed,
        "events_sessions": q_events_sessions,
        "events_sessions_stateful": q_events_sessions_stateful,
        "tpch_pricing": q_tpch_pricing,
        "top_customers": q_top_customers,
        "media_features": q_media_features,
        "transcripts_bm25": q_transcripts_bm25,
        "transcripts_filtered": q_transcripts_filtered,
        "transcripts_role_boosted": q_transcripts_role_boosted,
        "transcripts_snippets": q_transcripts_snippets,
        "transcripts_conv_rank": q_transcripts_conv_rank,
        "transcripts_bm25_and": q_transcripts_bm25_and,
        "transcripts_bm25_msm": q_transcripts_bm25_msm,
        "transcripts_phrase": q_transcripts_phrase,
        "transcripts_prefix": q_transcripts_prefix,
        "transcripts_roundtrip": q_transcripts_roundtrip,
        "block_layout": q_block_layout,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — built programmatically where repetitive
# ---------------------------------------------------------------------------

def _shingles_sql(src: str) -> str:
    """(doc_id, sh BIGINT[]) distinct hashed 3-gram shingles — twin of
    dedup.shingles_df(n=3)."""
    return f"""
  SELECT doc_id, list_distinct(list_transform(
           list_filter(
             list_transform(range(greatest(len(toks) - 3, 0) + 1),
               i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')),
             s -> s <> ''),
           s -> {_MD5LONG.format(x='s')})) AS sh
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM {src})
"""


def _jaccard_tail_sql(threshold: float) -> str:
    return f"""
sizes AS (SELECT doc_id, len(sh) AS sz FROM shing),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM (SELECT doc_id, unnest(sh) AS h FROM shing) a
  JOIN (SELECT doc_id, unnest(sh) AS h FROM shing) b USING (h)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {threshold}
"""


def _minhash_sig_sql(src: str, num_hashes: int = 16) -> str:
    mods = ", ".join(
        f"list_aggregate(list_transform(sh, h -> ({2*i+3} * (h % 1000000007) "
        f"+ {7*i+1}) % 1000000007), 'min') AS m{i}"
        for i in range(num_hashes))
    # WHERE len(sh) > 0 matches the Spark domain: minhash_signatures emits
    # no row for zero-shingle (empty/whitespace-only) docs, while an
    # unfiltered SQL twin would emit NULL mins for them — row-count skew
    return (f"WITH shing AS ({_shingles_sql(src)}) "
            f"SELECT doc_id, {mods} FROM shing WHERE len(sh) > 0")


def _simhash_sql(src: str) -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN tf ELSE -tf END) AS b{i}"
        for i in range(63))
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(63))
    return f"""
WITH tf AS (
  SELECT doc_id, t AS tok, count(*) AS tf, {_MD5LONG.format(x='t')} AS h
  FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM {src})
  GROUP BY doc_id, t
),
bits AS (SELECT doc_id, {bit_sums} FROM tf GROUP BY doc_id)
SELECT doc_id, {assemble} AS simhash FROM bits
"""


_STOP_EN = "['the','and','of','to','a','in','is','that','it','for']"


def _stop_list(lang: str) -> str:
    from pdx_spark.functions.textstats import STOPWORDS
    return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _bm25_trans_sql(query_terms: list[str], k: int, where: str = "TRUE") -> str:
    """BM25 over the transcripts fixture parquet: doc_id = dense
    (conv_id, turn_idx) rank, candidates restricted by `where`, stats
    global (same semantics as _bm25_sql)."""
    path = _transcripts_fixture_path()
    terms = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    return f"""
WITH trans AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, role, tool, text
  FROM read_parquet('{path}')
),
corpus AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM trans),
docs AS (SELECT doc_id, len(toks) AS dl, toks FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
qterms(term) AS (VALUES {terms}),
tf AS (
  SELECT d.doc_id, d.dl, u.t AS term, count(*) AS tf
  FROM docs d, unnest(d.toks) AS u(t)
  WHERE u.t IN (SELECT term FROM qterms)
  GROUP BY 1, 2, 3
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * {BM25.k1 + 1.0})
             / (tf.tf + {BM25.k1} * (1.0 - {BM25.b} + {BM25.b} * tf.dl / s.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
top AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  WHERE doc_id IN (SELECT doc_id FROM trans WHERE {where})
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT t.conv_id, t.turn_idx, top.score
FROM top JOIN trans t USING (doc_id)
"""


def _bm25_trans_boosted_sql(query_terms: list[str], k: int,
                            weights: dict[str, float]) -> str:
    """Weighted-BM25 twin of q_transcripts_role_boosted: the same global
    BM25 as _bm25_trans_sql, multiplied by a constant per-role weight
    before the top-k cut."""
    path = _transcripts_fixture_path()
    terms = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    case = " ".join(f"WHEN '{r}' THEN {w}" for r, w in weights.items())
    return f"""
WITH trans AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, role, tool, text
  FROM read_parquet('{path}')
),
corpus AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM trans),
docs AS (SELECT doc_id, len(toks) AS dl, toks FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
qterms(term) AS (VALUES {terms}),
tf AS (
  SELECT d.doc_id, d.dl, u.t AS term, count(*) AS tf
  FROM docs d, unnest(d.toks) AS u(t)
  WHERE u.t IN (SELECT term FROM qterms)
  GROUP BY 1, 2, 3
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * {BM25.k1 + 1.0})
             / (tf.tf + {BM25.k1} * (1.0 - {BM25.b} + {BM25.b} * tf.dl / s.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
weighted AS (
  SELECT sc.doc_id,
         sc.score * (CASE t.role {case} ELSE 1.0 END) AS wscore
  FROM scored sc JOIN trans t USING (doc_id)
),
top AS (
  SELECT doc_id, round(wscore, 4) AS score FROM weighted
  ORDER BY wscore DESC, doc_id ASC LIMIT {k}
)
SELECT t.conv_id, t.turn_idx, top.score
FROM top JOIN trans t USING (doc_id)
"""


def _bm25_trans_snippet_sql(query_terms: list[str], k: int) -> str:
    """Snippet twin of q_transcripts_snippets: top-k BM25 (same as
    _bm25_trans_sql) plus substring(text, max(1, pos-20), 60) where pos
    is the first occurrence of the first query term present."""
    base = _bm25_trans_sql(query_terms, k)
    # graft the snippet onto the final projection of the base oracle
    tail = ("SELECT t.conv_id, t.turn_idx, top.score\n"
            "FROM top JOIN trans t USING (doc_id)")
    assert base.rstrip().endswith(tail.splitlines()[-1]), base[-120:]
    pos = "1"
    for t in reversed(query_terms):  # first term present, in query order
        pos = (f"CASE WHEN strpos(lower(t.text), '{t.lower()}') > 0 "
               f"THEN strpos(lower(t.text), '{t.lower()}') ELSE {pos} END")
    new_tail = (
        "SELECT t.conv_id, t.turn_idx, top.score,\n"
        f"       substring(t.text, greatest(1, ({pos}) - 20), 60)"
        " AS snippet\n"
        "FROM top JOIN trans t USING (doc_id)")
    return base.replace(tail, new_tail)


def _bm25_trans_and_sql(query_terms: list[str], k: int,
                        min_match: int | None = None) -> str:
    """Match-count twin of q_transcripts_bm25_and / _msm: the tf CTE
    holds one row per matched (doc, term), so HAVING count(*) >= m (or
    = n_terms for AND) keeps exactly the docs reaching the match
    threshold."""
    base = _bm25_trans_sql(query_terms, k)
    anchor = "  GROUP BY tf.doc_id\n"
    assert anchor in base
    cond = (f">= {int(min_match)}" if min_match is not None
            else f"= {len(set(query_terms))}")
    return base.replace(
        anchor, anchor.rstrip("\n") + f"\n  HAVING count(*) {cond}\n")


def _bm25_trans_conv_sql(query_terms: list[str], k: int) -> str:
    """Conversation-rank twin of q_transcripts_conv_rank: max turn BM25
    per conv over ALL turns (ground truth for the engine's coverage
    argument), top-k convs."""
    base = _bm25_trans_sql(query_terms, 10_000_000)
    tail_at = base.index("top AS (")
    return base[:tail_at] + f"""conv AS (
  SELECT t.conv_id, max(sc.score) AS best
  FROM scored sc JOIN trans t USING (doc_id)
  GROUP BY 1
)
SELECT conv_id, round(best, 4) AS score FROM conv
ORDER BY best DESC, conv_id ASC LIMIT {k}
"""


def _bm25_trans_prefix_sql(prefix: str, k: int) -> str:
    """Prefix twin of q_transcripts_prefix: qterms derives from the
    corpus vocabulary with LIKE instead of a VALUES list; scoring is the
    same BM25 OR over the expansion."""
    base = _bm25_trans_sql(["zzplaceholderzz"], k)
    old = "qterms(term) AS (VALUES ('zzplaceholderzz'))"
    assert old in base
    return base.replace(old, (
        "qterms AS (SELECT DISTINCT u.t AS term "
        f"FROM corpus, unnest(toks) AS u(t) WHERE u.t LIKE '{prefix}%')"))


def _phrase_trans_sql(phrase: str, k: int) -> str:
    """Phrase twin of q_transcripts_phrase: phrase tf = count of start
    offsets where the token array carries the phrase contiguously;
    phrase-unit BM25 (idf from the phrase doc count over live docs,
    tfnorm from the phrase tf at the global avgdl)."""
    path = _transcripts_fixture_path()
    terms = phrase.split()
    n = len(terms)
    cond = " AND ".join(f"toks[i+{j + 1}] = '{t}'"
                        for j, t in enumerate(terms))
    return f"""
WITH trans AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, text
  FROM read_parquet('{path}')
),
docs AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM trans
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM docs),
ptf AS (
  SELECT doc_id, len(toks) AS dl,
         len(list_filter(range(len(toks) - {n - 1}),
                         i -> {cond})) AS tf
  FROM docs
),
hits AS (SELECT * FROM ptf WHERE tf > 0),
dfp AS (SELECT count(*) AS c FROM hits),
scored AS (
  SELECT h.doc_id,
         ln((s.n - d.c + 0.5) / (d.c + 0.5) + 1.0)
         * (h.tf * {BM25.k1 + 1.0})
         / (h.tf + {BM25.k1} * (1.0 - {BM25.b} + {BM25.b} * h.dl / s.avgdl))
         AS score
  FROM hits h CROSS JOIN dfp d CROSS JOIN stats s
),
top AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT t.conv_id, t.turn_idx, top.score
FROM top JOIN trans t USING (doc_id)
"""


_EMB_PAIRS_SQL = f"""
    WITH uni AS (SELECT * FROM {_DUP_EMB_SQL})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cosine
    FROM uni a, uni b
    WHERE a.vec_id < b.vec_id
      AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.999"""

_ANN_TOPK_SQL = """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {qid})
    SELECT {extra} e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings e CROSS JOIN q
    ORDER BY cosine DESC, e.vec_id ASC LIMIT 10"""


_MINHASH_PAIRS_SQL = f"""
            WITH sig AS ({_minhash_sig_sql(_DUP_SQL)}),
            buckets AS (
              SELECT doc_id, 0 AS band,
                     md5(m0::VARCHAR || '_' || m1::VARCHAR || '_'
                         || m2::VARCHAR || '_' || m3::VARCHAR) AS bucket
              FROM sig
              UNION ALL
              SELECT doc_id, 1,
                     md5(m4::VARCHAR || '_' || m5::VARCHAR || '_'
                         || m6::VARCHAR || '_' || m7::VARCHAR) FROM sig
              UNION ALL
              SELECT doc_id, 2,
                     md5(m8::VARCHAR || '_' || m9::VARCHAR || '_'
                         || m10::VARCHAR || '_' || m11::VARCHAR) FROM sig
              UNION ALL
              SELECT doc_id, 3,
                     md5(m12::VARCHAR || '_' || m13::VARCHAR || '_'
                         || m14::VARCHAR || '_' || m15::VARCHAR) FROM sig),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM buckets a JOIN buckets b USING (band, bucket)
              WHERE a.doc_id < b.doc_id),
            shing AS ({_shingles_sql(_DUP_SQL)}),
            sizes AS (SELECT doc_id, len(sh) AS sz FROM shing),
            common AS (
              SELECT c.doc_a, c.doc_b, count(*) AS common
              FROM cand c
              JOIN (SELECT doc_id, unnest(sh) AS h FROM shing) sa
                ON sa.doc_id = c.doc_a
              JOIN (SELECT doc_id, unnest(sh) AS h FROM shing) sb
                ON sb.doc_id = c.doc_b AND sb.h = sa.h
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(common * 1.0 / (za.sz + zb.sz - common), 6) AS jaccard
            FROM common
            JOIN sizes za ON za.doc_id = doc_a
            JOIN sizes zb ON zb.doc_id = doc_b
            WHERE common * 1.0 / (za.sz + zb.sz - common) >= 0.5"""

def oracle_sql() -> dict[str, str]:
    fp_step = "(a * 31 + b) % 1000000007"
    trans_path = _transcripts_fixture_path()
    sql = {
        "transcripts_bm25": _bm25_trans_sql(TRANS_QUERY.split(), 10),
        "transcripts_role_boosted": _bm25_trans_boosted_sql(
            TRANS_QUERY.split(), 10, ROLE_BOOST),
        "transcripts_snippets": _bm25_trans_snippet_sql(
            TRANS_QUERY.split(), 10),
        "transcripts_conv_rank": _bm25_trans_conv_sql(
            TRANS_QUERY.split(), 10),
        "transcripts_bm25_and": _bm25_trans_and_sql(
            TRANS_QUERY.split(), 10),
        "transcripts_bm25_msm": _bm25_trans_and_sql(
            TRANS_QUERY_3.split(), 10, min_match=2),
        "transcripts_phrase": _phrase_trans_sql(TRANS_PHRASE, 10),
        "transcripts_prefix": _bm25_trans_prefix_sql(TRANS_PREFIX, 10),
        "transcripts_filtered": _bm25_trans_sql(
            ["w0001", "w0050"], 10, where="role = 'assistant'"),
        "transcripts_roundtrip": f"""
            SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1
                     AS doc_id,
                   conv_id, turn_idx,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '[a-z0-9]+')) AS dl
            FROM read_parquet('{trans_path}')""",
        "block_layout": f"""
            WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
            tf AS (
              SELECT doc_id, t AS term, count(*) AS tf
              FROM (SELECT doc_id, unnest(tk) AS t FROM toks)
              WHERE t IN ('spark', 'data') GROUP BY 1, 2),
            posts AS (
              SELECT term, tf.doc_id, tf.tf, len(k.tk) AS dl,
                     tf.doc_id // 256 AS shard
              FROM tf JOIN toks k ON k.doc_id = tf.doc_id),
            numbered AS (
              SELECT *, row_number() OVER (PARTITION BY term, shard
                          ORDER BY doc_id) - 1 AS rn
              FROM posts)
            SELECT term, shard, rn // 64 AS block_id, count(*) AS n,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc,
                   max(tf) AS max_tf, min(dl) AS min_dl
            FROM numbered GROUP BY 1, 2, 3""",
        "bm25_exact": _bm25_sql(DOC_QUERY.split(), 10),
        "bm25_pruned": _bm25_sql(DOC_QUERY.split(), 10),
        "bm25_pruned_multi": (
            "SELECT 0 AS query_id, doc_id, score FROM ("
            + _bm25_sql(DOC_QUERY.split(), 10)
            + ") UNION ALL SELECT 1 AS query_id, doc_id, score FROM ("
            + _bm25_sql(DOC_QUERY_2.split(), 10) + ")"),
        "bm25_filtered": _bm25_sql(DOC_QUERY.split(), 10, where="lang = 'en'"),
        "corpus_stats": f"""
            SELECT count(*) AS n_docs,
                   round(avg(len({_TOKS_SQL})), 6) AS avgdl
            FROM documents""",
        "term_stats": f"""
            WITH tf AS (
              SELECT t AS term, doc_id, count(*) AS tf
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents)
              GROUP BY 1, 2)
            SELECT term, count(*) AS df, max(tf) AS max_tf
            FROM tf GROUP BY term
            ORDER BY df DESC, term ASC LIMIT 20""",
        "postings": f"""
            WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents)
            SELECT doc_id,
                   len(list_filter(tk, t -> t = 'spark')) AS tf,
                   len(tk) AS dl
            FROM toks WHERE len(list_filter(tk, t -> t = 'spark')) > 0
            ORDER BY doc_id""",
        "dedup_exact": f"""
            SELECT md5(coalesce(text, '')) AS text_md5,
                   count(*) AS n_dups, min(doc_id) AS canonical_doc_id
            FROM {_DUP_SQL} GROUP BY 1 HAVING count(*) >= 2""",
        "dedup_exact_norm": """
            WITH uni AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
                       AS doc_id,
                     upper(text) || '  ' AS text
              FROM documents WHERE doc_id % 7 = 0)
            SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                                           '\\s+', ' ', 'g'))) AS text_md5,
                   count(*) AS n_dups, min(doc_id) AS canonical_doc_id
            FROM uni GROUP BY 1 HAVING count(*) >= 2""",
        "dedup_drop_list": "SELECT DISTINCT doc_b AS drop_id FROM ("
                           + _MINHASH_PAIRS_SQL + ")",
        "dedup_jaccard": f"WITH shing AS ({_shingles_sql(_DUP_SQL)}), "
                         + _jaccard_tail_sql(0.8),
        "dedup_minhash": ("SELECT doc_id, m0, m1, m2, m3 FROM ("
                          + _minhash_sig_sql(_DUP_SQL) + ")"),
        # LSH with these parameters has zero false negatives at J>=0.5 only
        # probabilistically; the oracle is the exact-verified candidate set,
        # i.e. pairs sharing >= 1 of 4 bands. Twin SQL reproduces banding.
        "dedup_simhash": _simhash_sql("documents"),
        "dedup_simhash_pairs": f"""
            WITH sim AS ({_simhash_sql(_DUP_SQL)})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM sim a, sim b
            WHERE a.doc_id < b.doc_id
              AND bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "dedup_embedding": _EMB_PAIRS_SQL,
        # same exact-all-pairs oracle: the LSH candidate set has full
        # recall at this threshold (exact copies share every bucket), and
        # the Spark side verifies candidates with the same exact cosine
        "dedup_embedding_lsh": _EMB_PAIRS_SQL,
        "dedup_minhash_pairs": _MINHASH_PAIRS_SQL,
        "ann_bruteforce": _ANN_TOPK_SQL.format(qid=0, extra=""),
        # full probe (nprobe = 2^n_planes) scans every bucket => provably
        # equal to exact top-k; the SQL is a true oracle for the LSH path
        "ann_lsh": _ANN_TOPK_SQL.format(qid=0, extra=""),
        # full probe (nprobe = n_clusters) scans every learned bucket =>
        # provably equal to exact top-k; true oracle for the IVF path
        "ann_ivf": _ANN_TOPK_SQL.format(qid=0, extra=""),
        "ann_filtered": """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.label % 2 = 1
    ORDER BY cosine DESC, e.vec_id ASC LIMIT 10""",
        "ann_lsh_batch": " UNION ALL ".join(
            "SELECT * FROM (" + _ANN_TOPK_SQL.format(
                qid=q, extra=f"{q} AS query_id,") + ")"
            for q in (0, 1, 2)),
        "media_features": """
            WITH m AS (
              SELECT i AS media_id,
                     CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                ELSE 'video' END AS kind,
                     least(16 * (8 + i % 5), 64 + (i * 7) % 256) AS n_bytes,
                     substr(repeat(md5('42:' || i), 8 + i % 5), 1,
                            2 * least(16 * (8 + i % 5),
                                      64 + (i * 7) % 256)) AS ph
              FROM range(128) t(i)),
            h AS (SELECT media_id, kind, n_bytes, md5(ph) AS hh FROM m)
            SELECT media_id, kind, n_bytes,
                   round((('0x' || substr(hh, 3, 2) || substr(hh, 1, 2))
                          ::BIGINT) / 65536.0, 6) AS f0
            FROM h""",
        "text_stats": f"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(trim(coalesce(text, '')),
                       '\\s+'), x -> x <> '')) AS ws_tokens,
                   len({_TOKS_SQL}) AS re_tokens,
                   length(text) AS n_chars,
                   round(CASE WHEN length(coalesce(text, '')) > 0 THEN
                     (length(text) - length(regexp_replace(text,
                        '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0 / length(text)
                     ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN len({_TOKS_SQL}) > 0 THEN
                     len(list_filter({_TOKS_SQL},
                         t -> list_contains({_STOP_EN}, t))) * 1.0
                       / len({_TOKS_SQL})
                     ELSE 0.0 END, 6) AS stopword_ratio
            FROM documents""",
        "fingerprint": f"""
            SELECT doc_id,
                   list_reduce(list_prepend(0::BIGINT,
                     list_transform({_TOKS_SQL},
                       t -> {_MD5LONG.format(x='t')} % 1000000007)),
                     (a, b) -> {fp_step}) AS fp
            FROM documents""",
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2""",
        # closed sessions = all gap-sessions minus each user's last one
        # (append-mode state holds the open tail); timestamps compared
        # as emitted (us precision both sides)
        "events_sessions_stateful": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                       THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (SELECT user_id, ts,
                         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid FROM g),
            per AS (SELECT user_id, sid, min(ts) AS session_start,
                           max(ts) AS session_end, count(*) AS n_events
                    FROM s GROUP BY 1, 2),
            last AS (SELECT user_id, max(sid) AS sid FROM per GROUP BY 1)
            SELECT p.user_id, p.session_start, p.session_end, p.n_events
            FROM per p LEFT JOIN last l
              ON p.user_id = l.user_id AND p.sid = l.sid
            WHERE l.user_id IS NULL""",
        "events_sessions": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                       THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (SELECT user_id, ts,
                         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid FROM g),
            per AS (SELECT user_id, sid, count(*) AS n_events
                    FROM s GROUP BY 1, 2)
            SELECT user_id, count(*) AS n_sessions,
                   round(avg(n_events), 6) AS avg_events
            FROM per GROUP BY user_id""",
        "tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY 1, 2""",
        "top_customers": """
            SELECT c_name, round(sum(o_totalprice), 4) AS total,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name
            ORDER BY total DESC, c_name ASC LIMIT 10""",
    }
    # quality/lang_id SQL generated from the same constants as the Spark side
    sql["text_quality"] = f"""
        WITH b AS (
          SELECT doc_id, {_TOKS_SQL} AS toks, coalesce(text, '') AS t
          FROM documents),
        m AS (
          SELECT doc_id,
                 least(len(toks) / 50.0, 1.0) AS len_c,
                 1.0 - least(CASE WHEN length(t) > 0 THEN
                   (length(t) - length(regexp_replace(t, '[^a-zA-Z0-9 ]', '',
                    'g'))) * 1.0 / length(t) ELSE 0.0 END * 4, 1.0) AS punct_c,
                 CASE WHEN len(toks) > 0 THEN
                   len(list_filter(toks, x -> list_contains({_STOP_EN}, x)))
                     * 1.0 / len(toks) ELSE 0.0 END AS sw
          FROM b)
        SELECT doc_id,
               round((len_c + punct_c + (1.0 - least(abs(sw - 0.4) * 2, 1.0)))
                     / 3.0, 6) AS quality
        FROM m"""
    from pdx_spark.functions.textstats import STOPWORDS
    lang_cols = ", ".join(
        f"len(list_filter(toks, t -> list_contains({_stop_list(lang)}, t)))"
        f" AS c_{lang}" for lang in STOPWORDS)
    first_max = "greatest(" + ", ".join(f"c_{lang}" for lang in STOPWORDS) + ")"
    pick = "CASE "
    for lang in STOPWORDS:  # same iteration order as lang_guess's when-chain
        pick += f"WHEN c_{lang} = {first_max} AND {first_max} > 0 THEN '{lang}' "
    pick += "ELSE 'und' END"
    sql["lang_id"] = f"""
        WITH b AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        c AS (SELECT doc_id, {lang_cols} FROM b)
        SELECT doc_id, {pick} AS lang_guess FROM c"""
    return sql
