"""Query serving: block-max pruned top-k BM25 over the blocked segments.

Mirrors the reference's pruned scan (PDXearch::Search,
/root/reference/include/pdx/searcher.hpp:596-724), re-shaped for Spark:

  1. Query prep on the driver: tokenize, fetch idf of query terms from
     the term_stats parquet (filter pushdown on the sorted `term`
     column) — analog of rotate-the-query (searcher.hpp:602-613).
  2. Seed scan ("Start", searcher.hpp:218-281): exactly score the most
     promising shards per the broadcast directory (highest summed
     upper bound first — PDX's "most promising clusters first"),
     seeding the pruning threshold θ with the k-th best score.
  3. Main scan ("Warmup/Prune", searcher.hpp:376-540): only shards whose
     directory upper bound can still beat θ are read (left-semi join —
     partition pruning by score metadata); inside each shard the scorer
     builds a per-doc upper-bound array from block metadata alone (no
     decode) with a range-add/cumsum trick, masks docs below θ, skips
     blocks containing no surviving candidate, and fully scores the
     rest vectorized (numpy is our SIMD; scalar_computers.hpp:19-44's
     role). Exactness: every block containing a candidate is decoded,
     so candidate scores are complete; pruned docs provably score < θ.
  4. Global merge: per-shard top-k union -> window top-k per query
     (Spark's TakeOrderedAndProject-equivalent), tie-break
     (score desc, doc_id asc).

Everything between steps is a DataFrame; the scorer is one Arrow-batched
applyInPandas per shard. Queries run as a batch (one pass scores all
queries of the batch — amortizes job overhead, SURVEY §7.4).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark import schemas
from pdx_spark.config import BM25Params, IndexConfig
from pdx_spark.functions.blocks import decode_block
from pdx_spark.functions.bm25 import idf_np, tfnorm_np
from pdx_spark.functions.tokenize import tokenize_py
from pdx_spark.operators.indexer import read_manifest

_THETA_GUARD = 1e-9  # float-monotonicity guard on upper-bound comparisons


def _shard_scorer(payload: dict, has_mask: bool):
    """Build the per-shard scoring function.

    payload: {queries: [(qid, [terms sorted], k, theta|None)],
              idf: {term: float}, avgdl, k1, b, docs_per_shard}
    has_mask: scorer receives a second cogrouped frame of
              (shard, doc_id, p) rows — p=1 allowed-by-predicate,
              p=0 tombstoned. (reference analog: selection vectors,
              db_mock/predicate_evaluator.hpp:9-31)
    """
    queries = payload["queries"]
    idf = payload["idf"]
    avgdl = payload["avgdl"]
    params = BM25Params(k1=payload["k1"], b=payload["b"])
    width = payload["docs_per_shard"]
    # predicate_mode: None (no predicate), "allow" (mask rows are the
    # passing docs, low selectivity) or "deny" (mask rows are the failing
    # docs, high selectivity) — the F3 selectivity-adaptive branch.
    predicate_mode = payload.get("predicate_mode")
    out_cols = ["query_id", "doc_id", "score"]

    def score_shard(seg_pdf: pd.DataFrame, mask_pdf: pd.DataFrame | None):
        if len(seg_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        shard = int(seg_pdf["shard"].iloc[0])
        base = shard * width

        # doc-level allow/block mask for this shard (selection-vector analog)
        allow = None
        if mask_pdf is not None and (predicate_mode == "allow" or len(mask_pdf)):
            if predicate_mode == "allow":
                allow = np.zeros(width, dtype=bool)
                ok = mask_pdf.loc[mask_pdf["p"] == 1, "doc_id"].to_numpy() - base
                allow[ok] = True
            else:  # "deny" predicate and/or tombstones: baseline all-pass
                allow = np.ones(width, dtype=bool)
            bad = mask_pdf.loc[mask_pdf["p"] == 0, "doc_id"].to_numpy() - base
            allow[bad] = False

        # group block rows by term (term -> row indices, block_id order)
        seg_pdf = seg_pdf.sort_values(["term", "block_id"], kind="mergesort")
        terms_arr = seg_pdf["term"].to_numpy()
        first = seg_pdf["first_doc"].to_numpy(dtype=np.int64) - base
        last = seg_pdf["last_doc"].to_numpy(dtype=np.int64) - base
        # avgdl-drift-safe per-block upper bound (monotone in tf up, dl
        # down) — valid after appends shift avgdl, unlike stored gmax
        gub = tfnorm_np(seg_pdf["max_tf"].to_numpy(dtype=np.int64),
                        seg_pdf["min_dl"].to_numpy(dtype=np.int64),
                        avgdl, params)
        change = np.nonzero(terms_arr[1:] != terms_arr[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(terms_arr)]])
        term_rows = {str(terms_arr[s]): (s, e) for s, e in zip(starts, ends)}

        records = None  # lazy row materialization for decode
        decoded: dict[int, tuple] = {}

        out_q, out_d, out_s = [], [], []
        for qid, qterms, k, theta in queries:
            present = [t for t in qterms if t in term_rows]
            if not present:
                continue
            # candidate mask from block metadata only (range-add + cumsum)
            # — skipped entirely for unpruned scans (θ=None, no filter)
            cand = None
            if theta is not None:
                diff = np.zeros(width + 1, dtype=np.float64)
                for t in present:
                    s, e = term_rows[t]
                    w = idf[t] * gub[s:e]
                    np.add.at(diff, first[s:e], w)
                    np.add.at(diff, last[s:e] + 1, -w)
                ub = np.cumsum(diff[:width])
                cand = (ub > 0) & (ub >= theta - _THETA_GUARD * abs(theta))
            if allow is not None:
                cand = allow.copy() if cand is None else (cand & allow)
            ccum = None
            if cand is not None:
                if not cand.any():
                    continue
                ccum = np.concatenate([[0], np.cumsum(cand)])  # block-skip

            if records is None:
                records = seg_pdf.to_dict("records")
            scores = np.zeros(width, dtype=np.float64)
            for t in present:  # sorted term order == oracle accumulation order
                w_idf = idf[t]
                s, e = term_rows[t]
                for r in range(s, e):
                    if ccum is not None:
                        lo, hi = first[r], last[r]
                        if ccum[hi + 1] - ccum[lo] == 0:
                            continue  # no surviving candidate in block
                    if r not in decoded:
                        ids, tfs, dls = decode_block(records[r])
                        # g is query-independent: decode+normalize once,
                        # reuse across every query in the batch
                        decoded[r] = (ids - base,
                                      tfnorm_np(tfs, dls, avgdl, params))
                    pos, g = decoded[r]
                    scores[pos] += w_idf * g

            if cand is None:
                sel = np.flatnonzero(scores > 0)
            else:
                sel = np.flatnonzero(cand & (scores > 0))
            if len(sel) == 0:
                continue
            order = np.lexsort((sel, -scores[sel]))[:k]
            top = sel[order]
            out_q.extend([qid] * len(top))
            out_d.extend((top + base).tolist())
            out_s.extend(scores[top].tolist())

        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int32"),
                             "doc_id": pd.Series(out_d, dtype="int64"),
                             "score": pd.Series(out_s, dtype="float64")})

    if has_mask:
        def fn(key, seg_pdf, mask_pdf):  # cogrouped variant
            return score_shard(seg_pdf, mask_pdf)
    else:
        def fn(seg_pdf):
            return score_shard(seg_pdf, None)
    return fn


class Searcher:
    """Loaded index handle (analog of the restored PDX index +
    PDXearch searcher, index.hpp:241-267)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.manifest = read_manifest(path)
        p = self.manifest["params"]
        self.params = BM25Params(**p["bm25"])
        self.cfg = IndexConfig(**p["layout"])
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]

    @classmethod
    def load(cls, spark, path: str) -> "Searcher":
        return cls(spark, path)

    # -- lazy frames --------------------------------------------------------
    def segments(self) -> DataFrame:
        dirs = [os.path.join(self.path, d) for d in
                self.manifest["segment_dirs"] + self.manifest.get("deltas", [])]
        df = None
        for d in dirs:
            part = (self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true").parquet(d))
            df = part if df is None else df.unionByName(part)
        return df

    def docs(self) -> DataFrame:
        return self.spark.read.schema(schemas.DOCS).parquet(
            os.path.join(self.path, "docs"))

    def term_stats(self) -> DataFrame:
        return self.spark.read.schema(schemas.TERM_STATS).parquet(
            os.path.join(self.path, "term_stats"))

    def directory(self) -> DataFrame:
        return self.spark.read.schema(schemas.DIRECTORY).parquet(
            os.path.join(self.path, "directory"))

    def tombstones(self) -> DataFrame | None:
        p = os.path.join(self.path, "tombstones")
        if self.manifest.get("tombstones", 0) > 0 and os.path.exists(p):
            return self.spark.read.parquet(p)
        return None

    # -- public API ----------------------------------------------------------
    def search(self, query_text: str, k: int = 10, *, exact: bool = False,
               predicate: str | None = None) -> list[tuple[int, float]]:
        df = self.search_batch([(0, query_text, k)], exact=exact,
                               predicate=predicate)
        rows = df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def search_batch(self, queries: list[tuple[int, str, int]], *,
                     exact: bool = False, predicate: str | None = None,
                     seed_shards: int = 2, two_phase_min_shards: int = 64,
                     directory_collect_cap: int = 500_000) -> DataFrame:
        """-> DataFrame(query_id, doc_id, score), per-query top-k
        (materialized — result sets are tiny, <= Σ k).

        exact=True forces the exhaustive blocked scan (nprobe=0 analog,
        searcher.hpp:614-616). Otherwise the planner collects the
        directory rows of the query terms (tiny: |terms| x |shards|;
        capped — beyond the cap it falls back to exhaustive), computes
        per-(query, shard) upper bounds in numpy, and — only when enough
        shards are skippable to pay for a second job — runs the θ-seeded
        two-phase scan. Results are rank-identical either way; only the
        work differs. The adaptive choice mirrors the reference's
        selectivity-adaptive scan branches (searcher.hpp:321-345)."""
        parsed = []
        for qid, qtext, k in queries:
            terms = sorted(set(tokenize_py(qtext)))
            parsed.append((int(qid), terms, int(k)))
        all_terms = sorted({t for _, ts, _ in parsed for t in ts})
        empty = self.spark.createDataFrame([], schemas.RESULTS)
        if not all_terms:
            return empty

        # idf of query terms (parquet filter pushdown on sorted term col)
        stats = (self.term_stats().filter(F.col("term").isin(all_terms))
                 .select("term", "df").collect())
        idf = {r["term"]: float(idf_np(r["df"], self.n_docs)) for r in stats}
        live = [(q, [t for t in ts if t in idf], k) for q, ts, k in parsed]
        live = [(q, ts, k) for q, ts, k in live if ts]
        if not live:
            return empty
        all_terms = sorted({t for _, ts, _ in live for t in ts})

        seg = self.segments().filter(F.col("term").isin(all_terms))
        mask_df, pred_mode = self._mask_df(predicate)

        if exact:
            qspec = [(q, ts, k, None) for q, ts, k in live]
            res = self._scan(seg, qspec, idf, mask_df, pred_mode)
            return self._materialize(self._global_topk(res, live))

        # ---- driver-side plan from the directory (S2/S3 analog) ----
        plan = self._plan(live, idf, all_terms, directory_collect_cap)
        if plan is None or len(plan["shards"]) < max(two_phase_min_shards,
                                                     4 * seed_shards):
            # pruning can't skip enough shards to pay for a second job
            qspec = [(q, ts, k, None) for q, ts, k in live]
            res = self._scan(seg, qspec, idf, mask_df, pred_mode)
            return self._materialize(self._global_topk(res, live))

        import numpy as np
        shards = plan["shards"]              # sorted shard ids, len S
        ub = plan["ub"]                      # dict q -> float[S]
        seeds: set[int] = set()
        for q, _, _ in live:
            order = np.lexsort((shards, -ub[q]))[:seed_shards]
            seeds.update(int(shards[i]) for i in order if ub[q][i] > 0)
        seed_list = sorted(seeds)

        # ---- seed scan (Start analog): exact scores -> θ per query ----
        seg = seg.persist()
        seed_seg = seg.filter(F.col("shard").isin(seed_list))
        qspec = [(q, ts, k, None) for q, ts, k in live]
        seed_local = self._scan(seed_seg, qspec, idf, mask_df, pred_mode).collect()
        theta: dict[int, float] = {}
        by_q: dict[int, list] = {}
        for r in seed_local:
            by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
        kmap = {q: k for q, _, k in live}
        for q, rows in by_q.items():
            rows.sort(key=lambda x: (-x[1], x[0]))
            if len(rows) >= kmap[q]:
                theta[q] = rows[kmap[q] - 1][1]

        # ---- main scan over shards that can still beat θ ----
        need: set[int] = set()
        for q, _, _ in live:
            th = theta.get(q)
            if th is None:
                need.update(int(s) for i, s in enumerate(shards)
                            if ub[q][i] > 0)
            else:
                guard = th - _THETA_GUARD * abs(th)
                need.update(int(shards[i])
                            for i in np.flatnonzero(ub[q] >= guard))
        need -= seeds
        if need:
            if len(need) > 10_000:
                # big skip lists: broadcast semi-join beats a giant IN ()
                ndf = self.spark.createDataFrame(
                    [(int(s),) for s in sorted(need)], "shard long")
                main_seg = seg.join(F.broadcast(ndf), "shard", "left_semi")
            else:
                main_seg = seg.filter(F.col("shard").isin(sorted(need)))
            qspec = [(q, ts, k, theta.get(q)) for q, ts, k in live]
            main_rows = self._scan(main_seg, qspec, idf, mask_df,
                                   pred_mode).collect()
        else:
            main_rows = []
        seg.unpersist()

        allr = ([(r["query_id"], r["doc_id"], r["score"]) for r in seed_local]
                + [(r["query_id"], r["doc_id"], r["score"]) for r in main_rows])
        out: list = []
        by_q2: dict[int, list] = {}
        for q, d, sc in allr:
            by_q2.setdefault(q, []).append((d, sc))
        for q, rows in by_q2.items():
            rows.sort(key=lambda x: (-x[1], x[0]))
            out.extend((q, d, sc) for d, sc in rows[:kmap[q]])
        return self.spark.createDataFrame(out or [], schemas.RESULTS)

    def _plan(self, live, idf, all_terms, cap):
        """Collect (term, shard, max_tf, min_dl) directory rows for the
        query terms and compute per-(query, shard) upper bounds in numpy.
        Returns None when the directory slice exceeds `cap` rows (fall
        back to Spark-side exhaustive scan rather than a driver OOM)."""
        import numpy as np
        rows = (self.directory().filter(F.col("term").isin(all_terms))
                .select("term", "shard", "max_tf", "min_dl")
                .limit(cap + 1).collect())
        if len(rows) > cap:
            return None
        if not rows:
            return {"shards": np.array([], dtype=np.int64), "ub": {}}
        from pdx_spark.functions.bm25 import tfnorm_np
        shards = np.array(sorted({r["shard"] for r in rows}), dtype=np.int64)
        pos = {int(s): i for i, s in enumerate(shards)}
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        term_ub = {}
        for t, rs in by_term.items():
            v = np.zeros(len(shards))
            g = tfnorm_np(np.array([r["max_tf"] for r in rs]),
                          np.array([r["min_dl"] for r in rs]),
                          self.avgdl, self.params)
            for r, gi in zip(rs, g):
                v[pos[int(r["shard"])]] = idf[t] * gi
            term_ub[t] = v
        ub = {}
        for q, ts, _ in live:
            acc = np.zeros(len(shards))
            for t in ts:
                if t in term_ub:
                    acc += term_ub[t]
            ub[q] = acc
        return {"shards": shards, "ub": ub}

    def _materialize(self, df: DataFrame) -> DataFrame:
        rows = [(r["query_id"], r["doc_id"], r["score"]) for r in df.collect()]
        return self.spark.createDataFrame(rows or [], schemas.RESULTS)

    # -- internals -----------------------------------------------------------
    def _mask_df(self, predicate: str | None):
        """-> ((shard, doc_id, p) rows | None, predicate_mode).
        p=1 predicate-pass (allow mode), p=0 predicate-fail (deny mode)
        or tombstoned. Deny mode ships the complement when the predicate
        passes most docs — the selectivity-adaptive F3 analog (reference
        searcher.hpp:57, threshold 0.80)."""
        from pdx_spark.plans.planner import choose_filter_mode
        parts, mode = [], None
        if predicate is not None:
            mode, _ = choose_filter_mode(self.docs(), predicate, self.n_docs)
            if mode == "allow":
                parts.append(self.docs().filter(F.expr(predicate))
                             .select("doc_id").withColumn("p", F.lit(1)))
            else:
                # deny set = NOT (pred IS TRUE): null predicate results are
                # non-passing in both modes (consistent 3-valued logic)
                parts.append(self.docs()
                             .filter(~F.coalesce(F.expr(predicate), F.lit(False)))
                             .select("doc_id").withColumn("p", F.lit(0)))
        tomb = self.tombstones()
        if tomb is not None:
            parts.append(tomb.select("doc_id").withColumn("p", F.lit(0)))
        if not parts:
            return None, mode
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.withColumn(
            "shard", (F.col("doc_id") / self.cfg.docs_per_shard).cast("long")), mode

    def _scan(self, seg: DataFrame, qspec, idf: dict[str, float],
              mask_df: DataFrame | None, predicate_mode: str | None) -> DataFrame:
        payload = {"queries": qspec, "idf": idf,
                   "avgdl": self.avgdl, "k1": self.params.k1,
                   "b": self.params.b,
                   "docs_per_shard": self.cfg.docs_per_shard,
                   "predicate_mode": predicate_mode}
        if mask_df is not None:
            fn = _shard_scorer(payload, has_mask=True)
            return (seg.groupBy("shard")
                    .cogroup(mask_df.groupBy("shard"))
                    .applyInPandas(fn, schema=schemas.RESULTS))
        fn = _shard_scorer(payload, has_mask=False)
        return seg.groupBy("shard").applyInPandas(fn, schema=schemas.RESULTS)

    def _global_topk(self, res: DataFrame, live) -> DataFrame:
        kdf = self.spark.createDataFrame([(q, k) for q, _, k in live],
                                         "query_id int, k int")
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (res.join(F.broadcast(kdf), "query_id")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= F.col("k"))
                .select("query_id", "doc_id", "score"))

    # -- convenience ----------------------------------------------------------
    def lookup_keys(self, results: DataFrame) -> DataFrame:
        """Join results back to (conv_id, turn_idx) doc keys."""
        return results.join(self.docs().select("doc_id", "conv_id", "turn_idx"),
                            "doc_id", "left")
