"""pdx_spark — a PySpark-native inverted-index + BM25 top-k engine.

Re-instantiates the core idea of cwida/PDX ("partition-decomposed,
block-wise layout with metadata-driven pruned scanning",
reference: /root/reference/include/pdx/searcher.hpp, layout.hpp) as a
full-text engine: blocked, delta-encoded + bit-packed posting lists with
block-max impact metadata, scanned with block-max WAND pruning.

Public API (mirrors the reference's four-class Python surface,
reference python/pdxearch/index_factory.py:10-245):

    from pdx_spark import Indexer, Searcher, BM25Params
    handle = Indexer(spark, BM25Params()).build(df, path)
    searcher = Searcher.load(spark, path)
    results = searcher.search("query text", k=10)           # pruned (WAND)
    results = searcher.search("query text", k=10, exact=True)  # exhaustive
"""

from pdx_spark.config import BM25Params, IndexConfig, get_spark
from pdx_spark.operators.indexer import Indexer
from pdx_spark.operators.searcher import Searcher

__all__ = [
    "BM25Params",
    "IndexConfig",
    "Indexer",
    "Searcher",
    "get_spark",
]

__version__ = "0.1.0"
