"""BM25 math, in three matched dialects: Spark Column expressions (JVM),
numpy (block scorer), and ANSI SQL text (DuckDB oracle). All three MUST
implement FIXTURES.md §7 exactly:

    idf(t)      = ln((N - df + 0.5)/(df + 0.5) + 1)        (Lucene, >= 0)
    tfnorm(t,d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score       = sum_t idf(t) * tfnorm(t,d), float64

The tfnorm/idf factorization is what makes blocks idf-free: blocks store
(tf, dl); idf joins in at query time from broadcast stats, so appends
that shift df/N never invalidate packed blocks (contrast: the reference
bakes quantization params into clusters, scalar.hpp:60-74, and must
re-quantize on distribution shift).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pdx_spark.config import BM25Params


def idf_col(df_col, n_docs_col):
    return F.log((n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def tfnorm_col(tf_col, dl_col, avgdl_col, p: BM25Params):
    tf = tf_col.cast("double")
    denom = tf + F.lit(p.k1) * (F.lit(1.0 - p.b) + F.lit(p.b) * dl_col / avgdl_col)
    return tf * F.lit(p.k1 + 1.0) / denom


def idf_np(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tfnorm_np(tf, dl, avgdl: float, p: BM25Params):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5) + 1.0)"


def tfnorm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str, p: BM25Params) -> str:
    return (f"({tf_expr} * {p.k1 + 1.0}) / "
            f"({tf_expr} + {p.k1} * (1.0 - {p.b} + {p.b} * {dl_expr} / {avgdl_expr}))")
