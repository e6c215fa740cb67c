"""Exhaustive (non-pruned) BM25 top-k — pure DataFrame ops, zero UDFs.

This is the engine's `exact=True` path, the permanent analog of the
reference's nprobe=0 exhaustive mode (searcher.hpp:614-616) and the
rank-identity yardstick for the pruned WAND path. Everything here stays
JVM-side / whole-stage-codegen: broadcast the (tiny) query-terms table,
hash-join postings on term (Catalyst pushes term pruning into the scan),
partial-aggregate the per-doc sums map-side, window top-k per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark.config import BM25Params
from pdx_spark.functions.bm25 import idf_col, tfnorm_col
from pdx_spark.functions.tokenize import tokenize_py


def queries_to_terms_df(spark, queries: list[tuple[int, str, int]]):
    """[(query_id, query_text, k)] -> DataFrame(query_id, term, k) with
    distinct terms per query (BM25 ignores query-side tf; FIXTURES §7)."""
    rows = []
    for qid, qtext, k in queries:
        for t in sorted(set(tokenize_py(qtext))):
            rows.append((int(qid), t, int(k)))
    if not rows:
        return spark.createDataFrame([], "query_id int, term string, k int")
    return spark.createDataFrame(rows, "query_id int, term string, k int")


def exact_topk(postings: DataFrame, term_stats: DataFrame, n_docs: int,
               avgdl: float, params: BM25Params,
               queries: list[tuple[int, str, int]],
               require_all_terms: bool = False) -> DataFrame:
    """-> DataFrame(query_id, doc_id, score) with per-query top-k,
    tie-break (score desc, doc_id asc). Only score>0 docs appear (a
    posting join can't produce zero-score docs: Lucene idf > 0).
    require_all_terms=True keeps only docs matching EVERY query term
    (conjunctive/AND semantics): one JVM-side count per (query, doc)
    against the query's distinct-term count — still zero UDFs."""
    spark = postings.sparkSession
    qterms = queries_to_terms_df(spark, queries)

    idf = F.broadcast(
        term_stats.select("term", "df")
        .join(qterms.select("term").distinct(), "term", "left_semi")
        .withColumn("idf", idf_col(F.col("df"), F.lit(float(n_docs))))
        .select("term", "idf"))

    impact = (postings
              .join(F.broadcast(qterms), "term")
              .join(idf, "term")
              .withColumn("impact",
                          F.col("idf") * tfnorm_col(F.col("tf"), F.col("dl"),
                                                    F.lit(avgdl), params)))

    scored = (impact.groupBy("query_id", "k", "doc_id")
              .agg(F.sum("impact").alias("score"),
                   F.count(F.lit(1)).alias("_nm")))
    if require_all_terms:
        # postings hold one row per (term, doc), so _nm counts the
        # matched distinct terms; a query term absent from the whole
        # corpus never joins, so its query correctly yields no doc
        nterms = (qterms.groupBy("query_id")
                  .agg(F.countDistinct("term").alias("_nt")))
        scored = (scored.join(F.broadcast(nterms), "query_id")
                  .filter(F.col("_nm") == F.col("_nt")))
    scored = scored.drop("_nm", "_nt")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("k"))
            .select("query_id", "doc_id", "score"))
