"""Index maintenance: append / delete / compact.

Reference analogs (only PDXTreeIndex supports maintenance there,
/root/reference/include/pdx/index.hpp:581-638, cluster.hpp:107-154):

  M1 Append  -> delta artifacts, O(delta) work: new docs get fresh dense
     doc_ids past the current max; their postings become a new delta
     segment dir; per-term stats and directory rows for the delta are
     written as DELTA parquet dirs merged at read (never a rewrite of the
     base term_stats/directory — the round-1 scale-killer). Global stats
     (N, sum_dl -> avgdl) update incrementally from the batch aggregate.
     Crash-safe: every artifact lands via tmp-dir -> atomic rename and is
     UNREFERENCED until the manifest commit at the end — a crashed append
     leaves no phantom docs/postings (the retry overwrites the orphan
     dirs). Idempotent: callers passing batch_id (streaming ingest) get
     exactly-once semantics — a replayed micro-batch with
     batch_id <= manifest.last_batch_id is a no-op.
  M2 Delete  -> tombstones + EXACT stats: deleted doc_ids recorded in a
     tombstone parquet (the scorer masks them via the selection-vector
     channel, analog of tombstone slots, cluster.hpp:107-118); N/sum_dl
     shrink, and per-term df decrements are computed at delete time by
     decoding ONLY the affected shards' blocks (doc-range sharding makes
     that a targeted read) into a negative term_stats delta — idf is
     exact immediately after delete, not only after compact.
  M3-M6 Compact:
     compact_targeted() -> the SplitCluster/CompactCluster analog
       (index.hpp:1314-1611, cluster.hpp:260-294): rewrites ONLY shards
       that hold delta blocks or tombstoned postings into a patch
       segment dir; untouched base files stay byte-identical. Base
       term_stats/directory are untouched (bounds stay admissible:
       tombstone removal can only shrink true maxima).
     compact() -> full rewrite: merge everything, drop tombstones and
       dead docs, fold stat deltas into the base, reset all delta state.
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
from pdx_spark.operators.indexer import (_segment_encoder,
                                         _segment_encoder_docs,
                                         _write_manifest, read_manifest,
                                         write_directory,
                                         write_directory_rows)


def _atomic_write(df: DataFrame, final: str, sort_cols: list[str] | None = None):
    """tmp-dir -> rename commit protocol (same as the indexer's chunks)."""
    tmp = final + ".tmp"
    w = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    w.write.mode("overwrite").parquet(tmp)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)


class Maintainer:
    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.manifest = read_manifest(path)
        p = self.manifest["params"]
        self.params = BM25Params(**p["bm25"])
        self.cfg = IndexConfig(**p["layout"])

    # ---- shared readers (mirror Searcher's merged views) --------------------
    def _docs_raw(self):
        """All doc rows, INCLUDING compacted-away dead docs — id allocation
        must never reuse a dead id (the dead_docs anti-join would mask the
        reborn doc)."""
        df = None
        for d in self.manifest.get("docs_dirs", ["docs"]):
            part = self.spark.read.schema(schemas.DOCS).parquet(
                os.path.join(self.path, d))
            df = part if df is None else df.unionByName(part)
        return df

    def _docs(self):
        df = self._docs_raw()
        dead = self._dead_docs()
        return df if dead is None else df.join(dead, "doc_id", "left_anti")

    def _dead_docs(self):
        p = os.path.join(self.path, "dead_docs")
        if self.manifest.get("dead_docs", 0) > 0 and os.path.exists(p):
            return self.spark.read.parquet(p).select("doc_id")
        return None

    def _segments(self):
        df = None
        excl = self.manifest.get("seg_excludes", {})
        dirs = self.manifest.get("segment_dirs", ["segments/base"]) \
            + self.manifest.get("deltas", [])
        for d in dirs:
            part = (self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true")
                    .parquet(os.path.join(self.path, d)))
            ex = excl.get(d)
            if ex:
                part = part.filter(~F.col("shard").isin([int(s) for s in ex]))
            df = part if df is None else df.unionByName(part)
        return df

    def _stats(self) -> tuple[int, int]:
        """(n_docs, sum_dl) from the manifest; legacy manifests (no
        sum_dl) recompute once from docs."""
        m = self.manifest
        if "sum_dl" in m:
            return int(m["n_docs"]), int(m["sum_dl"])
        row = self._docs().agg(F.count("*").alias("n"),
                               F.sum("dl").alias("s")).collect()[0]
        return int(row["n"]), int(row["s"] or 0)

    # ---- M1: append ---------------------------------------------------------
    def append(self, transcripts: DataFrame, batch_id: int | None = None) -> dict:
        """Append new turns; O(delta) work, crash-safe, idempotent under
        batch_id replay (streaming foreachBatch re-runs the last
        uncommitted micro-batch on restart)."""
        m = self.manifest
        if batch_id is not None and batch_id <= m.get("last_batch_id", -1):
            return m  # replayed micro-batch: already committed
        t0 = time.time()
        # monotone artifact generation counter — list lengths would reuse
        # names after compact_targeted() resets `deltas`
        gen = int(m.get("gen", 0))
        m["gen"] = gen + 1
        max_id = self._docs_raw().agg(F.max("doc_id")).collect()[0][0]
        next_id = int(max_id) + 1 if max_id is not None else 0

        with_ids = C.assign_doc_ids(transcripts)
        with_ids = with_ids.withColumn("doc_id",
                                       F.col("doc_id") + F.lit(int(next_id)))
        with_ids.persist()
        dp = C.doc_postings(with_ids).persist()

        # 1) docs delta — staged; unreferenced until the manifest commit
        docs_delta = f"docs_delta-{gen}"
        new_docs = C.build_docs(with_ids, dp)
        _atomic_write(new_docs, os.path.join(self.path, docs_delta))
        drow = (self.spark.read.schema(schemas.DOCS)
                .parquet(os.path.join(self.path, docs_delta))
                .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
                .collect()[0])
        n_new, dl_new = int(drow["n"]), int(drow["s"] or 0)
        n_old, sum_old = self._stats()
        n_docs, sum_dl = n_old + n_new, sum_old + dl_new
        avgdl = sum_dl / n_docs if n_docs else 0.0

        # 2) delta segment: blocks store (tf, dl); pruning bounds are
        # recomputed from (max_tf, min_dl) at query time, so avgdl drift
        # cannot over-prune (see searcher._shard_scorer).
        delta_name = f"deltas/delta-{gen}"
        posts = dp.withColumn("shard", self.cfg.shard_of_expr())
        enc = _segment_encoder_docs(self.cfg, avgdl, self.params)
        seg = posts.groupBy("shard").applyInPandas(enc, schema=schemas.SEGMENTS)
        _atomic_write(seg, os.path.join(self.path, delta_name),
                      ["term", "shard", "block_id"])

        # 3) per-term stats DELTA (merged at read — base never rewritten)
        ts_delta = f"term_stats_delta-{gen}"
        delta_ts = C.term_stats_from_doc_postings(dp, avgdl, self.params) \
            .select("term", F.col("df").cast("long").alias("df"),
                    F.col("max_tf").cast("int").alias("max_tf"), "gmax")
        _atomic_write(delta_ts, os.path.join(self.path, ts_delta), ["term"])

        # 4) directory DELTA from the new segment only (u8-quantized with
        # its OWN affine params — delta values can exceed the base range)
        dir_delta = f"directory_delta-{gen}"
        seg_read = (self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true")
                    .parquet(os.path.join(self.path, delta_name)))
        dq = write_directory(seg_read, os.path.join(self.path, dir_delta))

        with_ids.unpersist()
        dp.unpersist()

        # 5) manifest commit — the single atomic visibility point
        m.setdefault("deltas", []).append(delta_name)
        m.setdefault("docs_dirs", ["docs"]).append(docs_delta)
        m.setdefault("ts_deltas", []).append(ts_delta)
        m.setdefault("dir_deltas", []).append(dir_delta)
        m.setdefault("dir_quant", {})[dir_delta] = dq
        m["n_docs"], m["sum_dl"], m["avgdl"] = n_docs, sum_dl, avgdl
        if batch_id is not None:
            m["last_batch_id"] = int(batch_id)
        m["lineage"].append({"stage": "append", "new_docs": n_new,
                             "batch_id": batch_id,
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        return m

    # ---- M2: delete ---------------------------------------------------------
    def delete(self, doc_keys: DataFrame) -> dict:
        """doc_keys: DataFrame(conv_id, turn_idx) (or doc_id). Tombstones
        the docs and keeps ALL stats exact: N/sum_dl shrink, and per-term
        df decrements (decoded from only the affected shards' blocks) land
        as a negative term_stats delta — post-delete scores are
        rank-identical to a fresh build over the live corpus."""
        t0 = time.time()
        m = self.manifest
        docs = self._docs()
        if "doc_id" in doc_keys.columns:
            dead = doc_keys.select("doc_id")
        else:
            dead = docs.join(doc_keys, ["conv_id", "turn_idx"], "left_semi") \
                       .select("doc_id")
        tomb_path = os.path.join(self.path, "tombstones")
        old = None
        if os.path.exists(tomb_path) and m.get("tombstones", 0) > 0:
            old = self.spark.read.parquet(tomb_path).select("doc_id")
        new_dead = dead if old is None else dead.join(old, "doc_id", "left_anti")
        dd = self._dead_docs()  # ids already compacted away: postings gone
        if dd is not None:
            new_dead = new_dead.join(dd, "doc_id", "left_anti")
        new_dead = new_dead.distinct().persist()

        # exact global stats: N/sum_dl shrink by the newly-dead docs
        drow = (docs.join(new_dead, "doc_id", "left_semi")
                .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
                .collect()[0])
        n_dead, dl_dead = int(drow["n"]), int(drow["s"] or 0)
        if n_dead == 0:
            new_dead.unpersist()
            return m
        n_old, sum_old = self._stats()
        n_docs, sum_dl = n_old - n_dead, sum_old - dl_dead
        avgdl = sum_dl / n_docs if n_docs else 0.0

        # exact per-term df: decode ONLY the affected shards (doc-range
        # sharding -> shard id is derivable from doc_id; parquet min/max
        # on the sorted shard column prunes row groups)
        shards = [int(r[0]) for r in new_dead.select(
            (F.col("doc_id") / self.cfg.docs_per_shard).cast("long")
            .alias("s")).distinct().collect()]
        seg = self._segments().filter(F.col("shard").isin(shards))
        posts = _decode_segments_to_postings(seg) \
            .join(new_dead, "doc_id", "left_semi")
        dec = (posts.groupBy("term")
               .agg((-F.count("*")).cast("long").alias("df"))
               .withColumn("max_tf", F.lit(0).cast("int"))
               .withColumn("gmax", F.lit(0.0)))
        gen = int(m.get("gen", 0))
        m["gen"] = gen + 1
        ts_delta = f"term_stats_delta-d{gen}"
        _atomic_write(dec, os.path.join(self.path, ts_delta), ["term"])

        merged = new_dead if old is None else old.unionByName(new_dead)
        _atomic_write(merged.select("doc_id"), tomb_path)
        n_tomb = self.spark.read.parquet(tomb_path).count()
        new_dead.unpersist()

        m["tombstones"] = int(n_tomb)
        m.setdefault("ts_deltas", []).append(ts_delta)
        m["n_docs"], m["sum_dl"], m["avgdl"] = n_docs, sum_dl, avgdl
        m["lineage"].append({"stage": "delete", "tombstones": int(n_tomb),
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        return m

    # ---- M4-M6: targeted compaction ----------------------------------------
    def compact_targeted(self) -> dict:
        """Rewrite ONLY shards holding delta blocks or tombstoned postings
        into a patch segment dir; every other base file stays
        byte-identical (the CompactCluster/SplitCluster analog — one
        cluster rewritten, not the index). Stats and directory are not
        rebuilt: term_stats deltas already carry the exact df state, and
        stale-high directory bounds remain admissible."""
        t0 = time.time()
        m = self.manifest
        tomb_path = os.path.join(self.path, "tombstones")
        tomb = (self.spark.read.parquet(tomb_path)
                if m.get("tombstones", 0) > 0 and os.path.exists(tomb_path)
                else None)

        affected: set[int] = set()
        for d in m.get("deltas", []):
            part = (self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true")
                    .parquet(os.path.join(self.path, d)))
            affected |= {int(r[0]) for r in part.select("shard").distinct().collect()}
        if tomb is not None:
            affected |= {int(r[0]) for r in tomb.select(
                (F.col("doc_id") / self.cfg.docs_per_shard).cast("long")
                .alias("s")).distinct().collect()}
        if not affected:
            return m
        shards = sorted(affected)

        src = self._segments().filter(F.col("shard").isin(shards))
        posts = _decode_segments_to_postings(src)
        if tomb is not None:
            posts = posts.join(tomb.select("doc_id"), "doc_id", "left_anti")
        avgdl = m["avgdl"]
        enc = _segment_encoder(self.cfg, avgdl, self.params)
        gen = int(m.get("gen", 0))
        m["gen"] = gen + 1
        patch = f"segments/patch-{gen}"
        new_seg = (posts.withColumn("shard", self.cfg.shard_of_expr())
                   .groupBy("shard").applyInPandas(enc, schema=schemas.SEGMENTS))
        _atomic_write(new_seg, os.path.join(self.path, patch),
                      ["term", "shard", "block_id"])

        # bookkeeping: base dirs exclude the patched shards; delta segment
        # dirs are folded into the patch entirely. Old artifacts are
        # deleted only AFTER the manifest commit — a crash in between
        # leaves harmless orphans, never a manifest pointing at deleted
        # dirs (same commit discipline as append).
        doomed = list(m.get("deltas", []))
        excl = m.setdefault("seg_excludes", {})
        for d in m.get("segment_dirs", ["segments/base"]):
            excl[d] = sorted(set(excl.get(d, [])) | affected)
        m["deltas"] = []
        m.setdefault("segment_dirs", ["segments/base"]).append(patch)

        # tombstoned postings are gone from segments; keep the doc-level
        # dead list so docs() (predicate masks, key lookups) stays live-only
        if tomb is not None:
            dd_path = os.path.join(self.path, "dead_docs")
            old_dd = (self.spark.read.parquet(dd_path).select("doc_id")
                      if m.get("dead_docs", 0) > 0 and os.path.exists(dd_path)
                      else None)
            merged = tomb.select("doc_id") if old_dd is None \
                else old_dd.unionByName(tomb.select("doc_id")).distinct()
            _atomic_write(merged, dd_path)
            m["dead_docs"] = self.spark.read.parquet(dd_path).count()
            m["tombstones"] = 0
            doomed.append("tombstones")

        m["lineage"].append({"stage": "compact_targeted",
                             "shards": len(shards),
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        for d in doomed:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return m

    # ---- minor (stats) compaction --------------------------------------------
    def compact_stats(self) -> dict:
        """LSM-style MINOR compaction: fold the accumulated term_stats /
        directory / docs DELTA dirs into one dir each. No base rewrite,
        no segment decode — cost is the total delta size. Keeps the
        merged-at-read path count bounded for long-running streaming
        ingest (the M3 cluster-health analog together with maintain())."""
        t0 = time.time()
        m = self.manifest
        doomed: list[str] = []
        gen = int(m.get("gen", 0))
        m["gen"] = gen + 1

        ts_deltas = m.get("ts_deltas", [])
        if len(ts_deltas) > 1:
            df = None
            for d in ts_deltas:
                part = self.spark.read.schema(schemas.TERM_STATS).parquet(
                    os.path.join(self.path, d))
                df = part if df is None else df.unionByName(part)
            folded = (df.groupBy("term")
                      .agg(F.sum("df").alias("df"),
                           F.max("max_tf").cast("int").alias("max_tf"),
                           F.max("gmax").alias("gmax")))
            new_ts = f"term_stats_delta-m{gen}"
            _atomic_write(folded, os.path.join(self.path, new_ts), ["term"])
            doomed += ts_deltas
            m["ts_deltas"] = [new_ts]

        dir_deltas = m.get("dir_deltas", [])
        if len(dir_deltas) > 1:
            from pdx_spark.functions.quantize import dequantize_col
            dq = m.get("dir_quant", {})
            df = None
            for d in dir_deltas:
                p = dq.get(d, {"tf_base": 0.0, "tf_scale": 0.0,
                               "dl_base": 0.0, "dl_scale": 0.0})
                part = (self.spark.read.schema(schemas.DIRECTORY)
                        .parquet(os.path.join(self.path, d))
                        .select("term", "shard", "n_blocks", "n_postings",
                                dequantize_col(F.col("max_tf_q"), p["tf_base"],
                                               p["tf_scale"]).alias("max_tf"),
                                dequantize_col(F.col("min_dl_q"), p["dl_base"],
                                               p["dl_scale"]).alias("min_dl")))
                df = part if df is None else df.unionByName(part)
            # re-quantizing dequantized (stale-high/stale-low) bounds with
            # the same ceil/floor discipline keeps them admissible
            rows = (df.groupBy("term", "shard")
                    .agg(F.sum("n_blocks").cast("int").alias("n_blocks"),
                         F.sum("n_postings").cast("long").alias("n_postings"),
                         F.max("max_tf").alias("max_tf"),
                         F.min("min_dl").alias("min_dl")))
            new_dir = f"directory_delta-m{gen}"
            params = write_directory_rows(rows, os.path.join(self.path, new_dir))
            doomed += dir_deltas
            for d in dir_deltas:
                m.get("dir_quant", {}).pop(d, None)
            m["dir_deltas"] = [new_dir]
            m.setdefault("dir_quant", {})[new_dir] = params

        docs_dirs = m.get("docs_dirs", ["docs"])
        if len(docs_dirs) > 2:  # base + more than one delta
            df = None
            for d in docs_dirs[1:]:
                part = self.spark.read.schema(schemas.DOCS).parquet(
                    os.path.join(self.path, d))
                df = part if df is None else df.unionByName(part)
            new_docs = f"docs_delta-m{gen}"
            _atomic_write(df, os.path.join(self.path, new_docs))
            doomed += docs_dirs[1:]
            m["docs_dirs"] = [docs_dirs[0], new_docs]

        m["lineage"].append({"stage": "compact_stats", "folded": len(doomed),
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        for d in doomed:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return m

    def maintain(self, max_deltas: int = 16) -> dict:
        """Health-check policy hook (CheckClusterHealth analog,
        index.hpp:581-638): fold stat deltas when too many accumulated;
        fold delta segments into a patch when too many. Called by
        streaming ingest after each append so unbounded micro-batching
        keeps bounded read paths."""
        m = self.manifest
        if (len(m.get("ts_deltas", [])) > max_deltas
                or len(m.get("dir_deltas", [])) > max_deltas
                or len(m.get("docs_dirs", [])) - 1 > max_deltas):
            m = self.compact_stats()
        if len(m.get("deltas", [])) > max_deltas:
            m = self.compact_targeted()
        return m

    # ---- M3-M6: full compact ------------------------------------------------
    def compact(self) -> dict:
        """Full rewrite: decode all live postings (every segment dir minus
        tombstones) and rebuild segments/docs/stats/directory from them;
        resets every delta/patch/exclude/dead-doc artifact."""
        t0 = time.time()
        m = self.manifest
        tomb_path = os.path.join(self.path, "tombstones")
        tomb = (self.spark.read.parquet(tomb_path)
                if os.path.exists(tomb_path) else None)

        posts = _decode_segments_to_postings(self._segments())
        if tomb is not None:
            posts = posts.join(tomb.select("doc_id"), "doc_id", "left_anti")

        docs = self._docs()
        if tomb is not None:
            docs = docs.join(tomb.select("doc_id"), "doc_id", "left_anti")
        drow = docs.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
        n_docs, sum_dl = int(drow["n"]), int(drow["s"] or 0)
        avgdl = sum_dl / n_docs if n_docs else 0.0

        enc = _segment_encoder(self.cfg, avgdl, self.params)
        n_encode = max(4 * self.spark.sparkContext.defaultParallelism,
                       int(self.spark.conf.get(
                           "spark.sql.shuffle.partitions", "8")))
        new_seg = (posts.withColumn("shard", self.cfg.shard_of_expr())
                   .repartition(n_encode, "shard")
                   .groupBy("shard").applyInPandas(enc, schema=schemas.SEGMENTS))
        # delta/patch/stat-delta dirs are deleted only AFTER the manifest
        # commit (crash in between = harmless orphans); the base segment
        # and docs swaps are the two documented brief destructive windows
        # of the full rewrite (the reference's Save has the same shape).
        doomed = (list(m.get("deltas", []))
                  + [d for d in m.get("segment_dirs", [])
                     if d != "segments/base"]
                  + [d for d in m.get("docs_dirs", ["docs"]) if d != "docs"]
                  + list(m.get("ts_deltas", []))
                  + list(m.get("dir_deltas", []))
                  + ["deltas", "tombstones", "dead_docs"])
        base = os.path.join(self.path, "segments", "base")
        tmp = os.path.join(self.path, "segments", "base.compact.tmp")
        new_seg.sortWithinPartitions("term", "shard", "block_id") \
               .write.mode("overwrite").parquet(tmp)
        shutil.rmtree(base)
        os.replace(tmp, base)

        # docs: fold deltas + drop dead into a single base dir
        docs_tmp = os.path.join(self.path, "docs.compact.tmp")
        docs.write.mode("overwrite").parquet(docs_tmp)
        shutil.rmtree(os.path.join(self.path, "docs"), ignore_errors=True)
        os.replace(docs_tmp, os.path.join(self.path, "docs"))

        # exact term stats + directory from the rewritten base
        fresh_seg = (self.spark.read.schema(schemas.SEGMENTS)
                     .option("recursiveFileLookup", "true").parquet(base))
        fresh_posts = _decode_segments_to_postings(fresh_seg)
        ts = C.term_stats(fresh_posts, n_docs, avgdl, self.params)
        _atomic_write(ts.coalesce(max(ts.sparkSession.sparkContext
                                      .defaultParallelism // 2, 1)),
                      os.path.join(self.path, "term_stats"), ["term"])
        dq = write_directory(fresh_seg, os.path.join(self.path, "directory"))

        m.update(segment_dirs=["segments/base"], deltas=[], ts_deltas=[],
                 dir_deltas=[], docs_dirs=["docs"], seg_excludes={},
                 tombstones=0, dead_docs=0, dir_quant={"directory": dq},
                 n_docs=n_docs, sum_dl=sum_dl, avgdl=avgdl)
        m["lineage"].append({"stage": "compact",
                             "sec": round(time.time() - t0, 2)})
        _write_manifest(self.path, m)
        for d in doomed:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return m


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
