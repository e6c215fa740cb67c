"""Index maintenance: append / delete / compact.

Reference analogs (only PDXTreeIndex supports maintenance there,
/root/reference/include/pdx/index.hpp:581-638, cluster.hpp:107-154):

  M1 Append  -> delta segments: new docs get fresh dense doc_ids past the
     current max; their postings are blocked into a new `deltas/` segment
     dir registered in the manifest. Old blocks are never rewritten —
     possible because blocks store (tf, dl), not idf-baked impacts
     (functions/bm25.py docstring). Query-side stats (N, avgdl, df) are
     refreshed in the manifest so scores stay exact over the merged
     corpus — the BM25-correct form of the reference's
     "append into nearest cluster".
  M2 Delete  -> tombstones: deleted doc_ids recorded in a tombstone
     parquet; the scorer masks them out (the selection-vector channel),
     and manifest stats are adjusted. Analog of tombstone slots
     (cluster.hpp:107-118).
  M3-M6 Compact -> rewrite: merge base+delta segments and drop
     tombstoned postings by decoding and re-encoding blocks, then swap
     dirs atomically. Analog of CompactCluster/SplitCluster
     (cluster.hpp:260-294, index.hpp:1314-1611) — in Spark a periodic
     batch job, not an online operation.
"""

from __future__ import annotations

import os
import shutil
import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdx_spark import schemas
from pdx_spark.config import BM25Params, IndexConfig
from pdx_spark.operators import corpus as C
from pdx_spark.operators.indexer import (Indexer, _segment_encoder,
                                         _segment_encoder_docs,
                                         _write_manifest, read_manifest)


class Maintainer:
    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.manifest = read_manifest(path)
        p = self.manifest["params"]
        self.params = BM25Params(**p["bm25"])
        self.cfg = IndexConfig(**p["layout"])

    def _docs(self):
        return self.spark.read.schema(schemas.DOCS).parquet(
            os.path.join(self.path, "docs"))

    # ---- M1: append ---------------------------------------------------------
    def append(self, transcripts: DataFrame) -> dict:
        """Append new turns. New doc_ids continue after current max so all
        existing blocks stay valid; stats + term_stats are recomputed
        incrementally (old df counts + delta df counts)."""
        t0 = time.time()
        next_id = (self._docs().agg(F.max("doc_id")).collect()[0][0] or -1) + 1

        with_ids = C.assign_doc_ids(transcripts)
        with_ids = with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(int(next_id)))
        with_ids.persist()
        dp = C.doc_postings(with_ids).persist()

        new_docs = C.build_docs(with_ids, dp)
        new_docs.write.mode("append").parquet(os.path.join(self.path, "docs"))

        posts = dp.withColumn("shard", self.cfg.shard_of_expr())
        # blocks store (tf, dl); gmax metadata uses build avgdl but pruning
        # bounds are recomputed from (max_tf, min_dl) at query time, so
        # avgdl drift cannot over-prune (see searcher._shard_scorer).
        delta_name = f"deltas/delta-{len(self.manifest.get('deltas', []))}"
        enc = _segment_encoder_docs(self.cfg, self.manifest["avgdl"], self.params)
        seg = posts.groupBy("shard").applyInPandas(enc, schema=schemas.SEGMENTS)
        final = os.path.join(self.path, delta_name)
        tmp = final + ".tmp"
        seg.sortWithinPartitions("term", "shard", "block_id") \
           .write.mode("overwrite").parquet(tmp)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

        # refresh global + per-term stats over the merged corpus
        docs = self._docs()
        n_docs, avgdl = C.corpus_stats(docs)
        old_ts = self.spark.read.schema(schemas.TERM_STATS).parquet(
            os.path.join(self.path, "term_stats"))
        delta_ts = C.term_stats_from_doc_postings(dp, avgdl, self.params)
        merged = (old_ts.unionByName(delta_ts)
                  .groupBy("term")
                  .agg(F.sum("df").alias("df"), F.max("max_tf").alias("max_tf"),
                       F.max("gmax").alias("gmax")))
        ts_tmp = os.path.join(self.path, "term_stats.tmp")
        merged.sort("term").write.mode("overwrite").parquet(ts_tmp)
        shutil.rmtree(os.path.join(self.path, "term_stats"))
        os.replace(ts_tmp, os.path.join(self.path, "term_stats"))

        with_ids.unpersist()
        dp.unpersist()
        m = self.manifest
        m.setdefault("deltas", []).append(delta_name)
        # refresh directory with delta blocks (AFTER registering the delta:
        # _segments() reads the manifest's delta list)
        self._rebuild_directory()
        m["n_docs"], m["avgdl"] = n_docs, avgdl
        m["lineage"].append({"stage": "append", "new_docs": int(n_docs),
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        return m

    # ---- M2: delete ---------------------------------------------------------
    def delete(self, doc_keys: DataFrame) -> dict:
        """doc_keys: DataFrame(conv_id, turn_idx) (or doc_id). Tombstones the
        docs; stats shrink so scores over the remaining corpus stay exact."""
        t0 = time.time()
        docs = self._docs()
        if "doc_id" in doc_keys.columns:
            dead = doc_keys.select("doc_id")
        else:
            dead = docs.join(doc_keys, ["conv_id", "turn_idx"], "left_semi") \
                       .select("doc_id")
        tomb_path = os.path.join(self.path, "tombstones")
        old = None
        if os.path.exists(tomb_path):
            old = self.spark.read.parquet(tomb_path).select("doc_id")
        merged = dead if old is None else old.unionByName(dead).distinct()
        tmp = tomb_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(tomb_path):
            shutil.rmtree(tomb_path)
        os.replace(tmp, tomb_path)
        n_tomb = self.spark.read.parquet(tomb_path).count()

        # stats over live docs only (exactness of idf/avgdl post-delete)
        live = docs.join(self.spark.read.parquet(tomb_path), "doc_id", "left_anti")
        n_docs, avgdl = C.corpus_stats(live)
        # per-term df must drop for terms in deleted docs: recompute df by
        # decoding is expensive; instead store df adjustments from the doc's
        # postings — deletes are rare, so recompute df from live postings of
        # affected terms at compaction; until then idf uses adjusted N with
        # original df (documented staleness, resolved by compact()).
        m = self.manifest
        m["tombstones"] = int(n_tomb)
        m["n_docs"], m["avgdl"] = n_docs, avgdl
        m["lineage"].append({"stage": "delete", "tombstones": int(n_tomb),
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        return m

    # ---- M3-M6: compact -----------------------------------------------------
    def compact(self) -> dict:
        """Full rewrite: decode all live postings (base + deltas minus
        tombstones) and rebuild segments/stats/directory from them. The
        batch analog of CompactCluster + merge/split maintenance."""
        t0 = time.time()
        tomb_path = os.path.join(self.path, "tombstones")
        tomb = self.spark.read.parquet(tomb_path) if os.path.exists(tomb_path) else None

        seg = self._segments()
        posts = _decode_segments_to_postings(seg)
        if tomb is not None:
            posts = posts.join(tomb, "doc_id", "left_anti")

        docs = self._docs()
        if tomb is not None:
            docs = docs.join(tomb, "doc_id", "left_anti")
        n_docs, avgdl = C.corpus_stats(docs)

        enc = _segment_encoder(self.cfg, avgdl, self.params)
        new_seg = (posts.withColumn("shard", self.cfg.shard_of_expr())
                   .groupBy("shard").applyInPandas(enc, schema=schemas.SEGMENTS))
        base = os.path.join(self.path, "segments", "base")
        tmp = os.path.join(self.path, "segments", "base.compact.tmp")
        new_seg.sortWithinPartitions("term", "shard", "block_id") \
               .write.mode("overwrite").parquet(tmp)
        shutil.rmtree(base)
        os.replace(tmp, base)
        for d in self.manifest.get("deltas", []):
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        shutil.rmtree(os.path.join(self.path, "deltas"), ignore_errors=True)
        if tomb is not None:
            docs_tmp = os.path.join(self.path, "docs.tmp")
            docs.write.mode("overwrite").parquet(docs_tmp)
            shutil.rmtree(os.path.join(self.path, "docs"))
            os.replace(docs_tmp, os.path.join(self.path, "docs"))
            shutil.rmtree(tomb_path, ignore_errors=True)

        # exact term stats from live postings
        fresh_posts = _decode_segments_to_postings(
            self.spark.read.schema(schemas.SEGMENTS)
            .option("recursiveFileLookup", "true").parquet(base))
        ts = C.term_stats(fresh_posts, n_docs, avgdl, self.params)
        ts_tmp = os.path.join(self.path, "term_stats.tmp")
        ts.sort("term").write.mode("overwrite").parquet(ts_tmp)
        shutil.rmtree(os.path.join(self.path, "term_stats"))
        os.replace(ts_tmp, os.path.join(self.path, "term_stats"))
        self._rebuild_directory()

        m = self.manifest
        m["deltas"] = []
        m["tombstones"] = 0
        m["n_docs"], m["avgdl"] = n_docs, avgdl
        m["lineage"].append({"stage": "compact", "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        return m

    # ---- helpers ------------------------------------------------------------
    def _segments(self):
        dirs = ["segments/base"] + self.manifest.get("deltas", [])
        df = None
        for d in dirs:
            part = (self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true")
                    .parquet(os.path.join(self.path, d)))
            df = part if df is None else df.unionByName(part)
        return df

    def _rebuild_directory(self):
        out = os.path.join(self.path, "directory")
        tmp = out + ".tmp"
        (self._segments().groupBy("term", "shard")
         .agg(F.count("*").cast("int").alias("n_blocks"),
              F.sum("n").cast("long").alias("n_postings"),
              F.max("max_tf").cast("int").alias("max_tf"),
              F.min("min_dl").cast("int").alias("min_dl"),
              F.max("gmax").alias("gmax"))
         .sort("term", "shard")
         .write.mode("overwrite").parquet(tmp))
        if os.path.exists(out):
            shutil.rmtree(out)
        os.replace(tmp, out)


def _decode_segments_to_postings(seg: DataFrame) -> DataFrame:
    """Explode packed blocks back to (term, doc_id, tf, dl) rows — the M8
    de-transpose analog (cluster.hpp:165-181)."""
    from pdx_spark.functions.blocks import decode_block

    def fn(batches):
        for pdf in batches:
            terms, ids, tfs, dls = [], [], [], []
            for rec in pdf.to_dict("records"):
                i, t, d = decode_block(rec)
                terms.extend([rec["term"]] * len(i))
                ids.append(i); tfs.append(t); dls.append(d)
            if not ids:
                yield pd.DataFrame({"term": [], "doc_id": [], "tf": [], "dl": []})
                continue
            import numpy as np
            yield pd.DataFrame({
                "term": terms,
                "doc_id": np.concatenate(ids).astype("int64"),
                "tf": np.concatenate(tfs).astype("int32"),
                "dl": np.concatenate(dls).astype("int32")})

    return seg.mapInPandas(fn, schema="term string, doc_id long, tf int, dl int")
