"""Query serving: block-max pruned top-k BM25 over the blocked segments.

Mirrors the reference's pruned scan (PDXearch::Search,
/root/reference/include/pdx/searcher.hpp:596-724), re-shaped for Spark:

  1. Query prep on the driver: tokenize, fetch idf of query terms from
     the term_stats parquet (filter pushdown on the sorted `term`
     column) — analog of rotate-the-query (searcher.hpp:602-613).
  2. Spark-side plan: the directory slice of the query terms joins a
     broadcast (query, term, idf) frame and aggregates to per-
     (query, shard) upper bounds — the "rank clusters by promise" step
     (searcher.hpp:181-215) as a DataFrame, never collected.
  3. Seed scan ("Start", searcher.hpp:218-281): each query's most
     promising `seed_shards` shards are scored exactly. Driver traffic
     is bounded: the seed routing (≤ seed_shards × Q pairs) and the
     k-th best seed score per query (θ, Q floats) — never candidates.
  4. Main scan ("Warmup/Prune", searcher.hpp:376-540): per-(query,
     shard) assignments where the upper bound can still beat θ route
     each shard to only its own queries (work = Σ_q |shards_q|, not
     |shards| × Q). Scans are SHUFFLE-FREE: segment files hold complete
     shards (the encode shuffle wrote them that way), so the scorer
     runs as mapInPandas directly on the parquet scan with routing in
     the closure (_partition_scorer; the cogroup channel remains for
     predicate masks and routing above _ROUTING_CAP). When θ cannot
     prune (uniform corpora — every shard's bound beats θ), the
     planner detects it from the main-pair ratio and runs ONE unrouted
     pass instead, discarding the seed results (their shards are
     rescored; a union would duplicate rows). Inside a shard the
     scorer builds a per-doc upper-bound array from block metadata
     alone (range-add/cumsum), masks docs below θ, skips terms with no
     surviving candidate, decodes each term ONCE PER PARTITION (all of
     the partition's shards in one batched unpack, sliced per shard by
     searchsorted), and scores with one vectorized add per (query,
     term) in float64 (numpy is our SIMD; scalar_computers.hpp:19-44's
     role). Exactness: every term with a candidate is decoded fully,
     so candidate scores are complete; pruned docs provably score < θ.
  5. Global merge: per-partition per-query top-k -> window top-k per
     query (Spark's TakeOrderedAndProject-equivalent, executor-side),
     then a final Σk-row collect. Tie-break (score desc, doc_id asc).

Queries run as a batch (one pass scores all queries of the batch —
amortizes job overhead, SURVEY §7.4). A batch is a handful of bounded
jobs: idf lookup, plan + seed scan (→ θ), main scan + merge — the
serial fraction is job scheduling plus Q-sized collects, which is what
makes query throughput scale with executors (north rule ≥0.8 N→4N).
The remaining single-box limit is memory bandwidth (the scan streams
block bytes through Arrow/numpy) — see BENCH.md's bandwidth ceiling.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark import schemas
from pdx_spark.config import SEED, BM25Params, IndexConfig
from pdx_spark.fs import index_fs, verify_single_rowgroup
from pdx_spark.functions.blocks import decode_term_run
from pdx_spark.functions.bm25 import idf_np, tfnorm_col, tfnorm_np
from pdx_spark.functions.tokenize import tokenize_py
from pdx_spark.operators.indexer import MANIFEST, read_manifest

_THETA_GUARD = 1e-9  # float-monotonicity guard on upper-bound comparisons


def _pdf_df(spark, data: dict, schema) -> DataFrame:
    """createDataFrame via pandas — takes the Arrow fast path instead of
    per-row JVM conversion (matters at thousands of driver-side rows:
    query-term frames, seed top-k, result materialization — all part of
    the per-batch FIXED cost that bounds scaling)."""
    return spark.createDataFrame(pd.DataFrame(data), schema=schema)

# max (query, shard) routing pairs shipped via the scorer closure; above
# this the cogroup channel carries routing (never collected to the driver)
_ROUTING_CAP = 200_000

# max directory rows the driver-side planner will read per batch; above
# this (or on a remote fs) planning runs distributed via ub_df
_PLAN_SLICE_CAP = 2_000_000

# max rows the driver-side global top-k merge may collect (bounded by
# n_segment_files x Σk); above this the window merge runs Spark-side
_MERGE_LOCAL_CAP = int(os.environ.get("PDX_MERGE_LOCAL_CAP", 4_000_000))

# map-scan runs as mapInArrow (payloads decoded from Arrow buffers, no
# per-cell Python bytes objects); "0" falls back to mapInPandas — the
# A/B escape hatch, results identical either way
_ARROW_SCAN = os.environ.get("PDX_ARROW_SCAN", "1") != "0"

# adaptive-planner feedback: after this many consecutive unrouted
# fallbacks (θ pruned nothing), skip the seed phase; re-probe two-phase
# after this many bypassed batches OR this many wall seconds (ten
# bypassed batches can be ten seconds or ten hours) OR any on-disk
# manifest change (append/compact can make a corpus prunable)
_UNROUTED_BYPASS = 2
_BYPASS_REPROBE = 10
_BYPASS_REPROBE_SECS = 300.0

# cogroup side-channel row kinds (one aux frame carries both because
# applyInPandas cogroups exactly two frames); aux rows are
# (shard long, kind int, id long, p int)
_KIND_MASK = 0   # (shard, kind=0, id=doc_id, p): selection-vector row
_KIND_QUERY = 1  # (shard, kind=1, id=query_id): per-shard query routing

# target decoded bytes per routed-scan task. Every python task costs a
# fixed ~0.2 CPU-s (Arrow runner round-trip) regardless of data, so a
# routed scan over a small slice should run FEW tasks: task count is
# capped at ceil(routed_bytes / this) in addition to the shard-count and
# parallelism caps. 2 MiB balances the two regimes: tiny routed slices
# (a well-pruned scan) still run 1-2 tasks, while a routed scan whose
# byte slice is large (seed phase of a big batch, unprunable corpora)
# fills the cores instead of idling 80% of them — at 8 MiB the bench's
# forced-two-phase seed scan ran 6 tasks on 32 cores (0.89 s; 0.41 s at
# 2 MiB, interleaved A/B), and a byte cap below parallelism is exactly
# what breaks N->4N query scaling. At 100 TB the byte cap is never the
# binding term — defaultParallelism is.
_ROUTED_TASK_BYTES = int(os.environ.get("PDX_ROUTED_TASK_BYTES",
                                        2 * 1024 * 1024))



def _in_list(col: str, values) -> "F.Column":
    """One-round-trip IN predicate over a python string list.

    `Column.isin(*values)` builds one JVM literal per element — one py4j
    round-trip each (measured: a 3,200-query batch carries ~2,900
    distinct terms and spent 8-10 s of DRIVER-SERIAL time just building
    the filter — pure fixed cost that does not shrink with executors).
    Emitting a single SQL IN list is one parse call; Catalyst still
    converts it to the same InSet. Values are tokenizer output
    ([a-z0-9]+), but escape defensively anyway."""
    if not values:
        return F.lit(False)
    esc = ",".join("'" + str(v).replace("\\", "\\\\").replace("'", "\\'")
                   + "'" for v in values)
    return F.expr(f"{col} IN ({esc})")


def _shard_ranges(shards) -> list[list[int]]:
    """Sorted shard ids compressed into contiguous [lo, hi] runs."""
    runs: list[list[int]] = []
    for sh in sorted(int(x) for x in shards):
        if runs and sh == runs[-1][1] + 1:
            runs[-1][1] = sh
        else:
            runs.append([sh, sh])
    return runs


def _shard_sql(runs: list[list[int]]) -> str:
    if not runs:
        return "false"
    return "(" + " OR ".join(
        f"shard = {a}" if a == b else f"shard BETWEEN {a} AND {b}"
        for a, b in runs) + ")"


def _shard_filter(shards) -> "F.Column":
    """Predicate selecting a shard set, compressed into contiguous
    BETWEEN-ranges. Two reasons over a plain isin: (1) Spark only pushes
    IN lists below spark.sql.parquet.pushdown.inFilterThreshold (10!) to
    the parquet reader — above that the filter runs post-scan and the
    routed scan silently reads EVERY file; range predicates push down
    regardless, and segment files hold contiguous shard ranges (the
    range-partitioned encode), so pushed ranges skip whole files via
    row-group stats. (2) at 10^12-doc scale a routing's shard list can
    be 10^5 ids — a handful of BETWEEN runs is a constant-size plan.
    Built as ONE SQL string -> one py4j round trip (Column-composition
    is one driver round trip per operator — measured seconds per batch
    at a few hundred disjuncts)."""
    return F.expr(_shard_sql(_shard_ranges(shards)))


# disjunct budget for the per-term row filter; above this the plan falls
# back to the (coarser) union-of-shards filter to keep codegen bounded
_TERM_FILTER_MAX_RUNS = 512


def _term_shard_filter(term_shards: dict[str, set],
                       routing: dict[int, set]) -> "F.Column | None":
    """Row-precise JVM filter for the routed main scan:
    OR_t (term = t AND shard IN ranges_t). The union-of-shards filter
    alone is self-defeating on batches whose queries route to DIFFERENT
    shard sets (16 queries x 16 disjoint topics = the union covers the
    whole corpus): every query term's rows in every unioned shard cross
    the Arrow boundary only to be dropped by the per-query routing in
    the scorer. This predicate drops them in the JVM scan instead —
    rows shipped to python shrink from |union| x |terms| to
    Σ_t |shards_t| — and it composes with row-group pruning (term and
    shard stats both evaluated per file). Returns None when the
    disjunct budget is exceeded (fall back to the union filter).

    Implementation: the run budget is counted BEFORE any expression is
    built (pure python), and the predicate is ONE SQL string parsed by
    one F.expr call. The original Column-composition paid ~4 py4j
    driver round trips per term and, worse, paid them even on batches
    that would bail to None — ~3s of untimed driver-serial latency per
    200-query forced-two-phase batch (the round-4 bench regression)."""
    per_term: list[tuple[str, list[list[int]]]] = []
    total_runs = 0
    for t, shards in term_shards.items():
        runs = _shard_ranges(shards)
        total_runs += len(runs)
        if total_runs > _TERM_FILTER_MAX_RUNS:
            return None
        per_term.append((t, runs))
    if not per_term:
        return F.lit(False)
    parts = []
    for t, runs in per_term:
        # tokens are [a-z0-9]+ runs (tokenize.py) — assert, don't trust
        assert t.isascii() and t.isalnum(), t
        parts.append(f"(term = '{t}' AND {_shard_sql(runs)})")
    return F.expr("(" + " OR ".join(parts) + ")")


def _shard_scorer(payload: dict, has_aux: bool):
    """Build the per-shard scoring function.

    payload: {queries: [(qid, [terms sorted], k, theta|None)],
              idf: {term: float}, avgdl, k1, b, docs_per_shard,
              assigned: bool, has_mask: bool}
    has_aux: scorer receives a second cogrouped frame of
             (shard, kind, id, p) rows — kind=0 mask rows (p=1
             allowed-by-predicate, p=0 tombstoned/denied; the
             selection-vector analog of
             db_mock/predicate_evaluator.hpp:9-31), kind=1 query
             routing rows (this shard scores only those query ids).
    """
    queries = payload["queries"]
    idf = payload["idf"]
    avgdl = payload["avgdl"]
    params = BM25Params(k1=payload["k1"], b=payload["b"])
    width = payload["docs_per_shard"]
    assigned = payload["assigned"]
    has_mask = payload["has_mask"]
    # closure-carried small mask ({mode, ids sorted, p}) — the scan-fused
    # selection vector; aux mask rows take precedence when both exist
    cmask = payload.get("mask")
    # match-count semantics: require_all (AND) demands every query
    # term; min_match m demands >= m distinct terms (OR is m=1). Exact
    # per shard (doc-range sharding keeps all of a doc's postings in
    # one shard); callers drop queries that cannot reach m upfront.
    require_all = payload.get("require_all", False)
    min_match = int(payload.get("min_match", 1))
    count_matches = require_all or min_match > 1
    # predicate_mode: None (no predicate), "allow" (mask rows are the
    # passing docs, low selectivity) or "deny" (mask rows are the failing
    # docs, high selectivity) — the F3 selectivity-adaptive branch.
    predicate_mode = payload.get("predicate_mode")
    out_cols = ["query_id", "doc_id", "score"]
    empty_out = pd.DataFrame({"query_id": pd.Series([], dtype="int32"),
                              "doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})

    def score_shard(seg_pdf: pd.DataFrame, aux_pdf: pd.DataFrame | None,
                    assigned_override=None, part_lookup=None):
        if len(seg_pdf) == 0:
            return empty_out
        shard = int(seg_pdf["shard"].iloc[0])
        base = shard * width

        assigned_ids = assigned_override
        mask_ids = mask_p = None
        if aux_pdf is not None and len(aux_pdf):
            kind = aux_pdf["kind"].to_numpy()
            if assigned:
                assigned_ids = set(
                    aux_pdf["id"].to_numpy()[kind == _KIND_QUERY].tolist())
            if has_mask:
                msel = kind == _KIND_MASK
                mask_ids = aux_pdf["id"].to_numpy(dtype=np.int64)[msel]
                mask_p = aux_pdf["p"].to_numpy()[msel]
        if assigned and not assigned_ids:
            return empty_out  # no query routed to this shard
        if has_mask and mask_ids is None and cmask is not None:
            # slice this shard's window out of the sorted closure mask
            lo = np.searchsorted(cmask["ids"], base)
            hi = np.searchsorted(cmask["ids"], base + width)
            mask_ids = cmask["ids"][lo:hi]
            mask_p = cmask["p"][lo:hi]

        # doc-level allow/block mask for this shard (selection-vector analog)
        allow = None
        if has_mask and (predicate_mode == "allow"
                         or (mask_ids is not None and len(mask_ids))):
            if predicate_mode == "allow":
                allow = np.zeros(width, dtype=bool)
                if mask_ids is not None:
                    allow[mask_ids[mask_p == 1] - base] = True
            else:  # "deny" predicate and/or tombstones: baseline all-pass
                allow = np.ones(width, dtype=bool)
            if mask_ids is not None:
                allow[mask_ids[mask_p == 0] - base] = False

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

        # per-TERM decode cache: (positions, g) concatenated across the
        # term's blocks, decoded at most once for the whole query batch.
        # Scoring is then ONE fancy-index add per (query, term) — the
        # per-(query, term, block) Python loop was the CPU hot spot (and
        # its memory churn was what broke N->4N scaling on shared hosts).
        cols_box: list = [None]
        decoded_terms: dict[str, tuple] = {}

        def term_arrays(t: str):
            hit = decoded_terms.get(t)
            if hit is None:
                if part_lookup is not None:
                    # partition-level decode (one pass per term across
                    # ALL the partition's shards) + slice: the term's
                    # absolute ids are ascending, so this shard's run is
                    # a contiguous [base, base+width) window
                    ids_abs, g_all = part_lookup(t)
                    lo = np.searchsorted(ids_abs, base)
                    hi = np.searchsorted(ids_abs, base + width)
                    hit = (ids_abs[lo:hi] - base, g_all[lo:hi])
                else:
                    if cols_box[0] is None:
                        cols_box[0] = (
                            seg_pdf["n"].to_numpy(np.int64),
                            seg_pdf["ids_bw"].to_numpy(np.int64),
                            seg_pdf["tfs_bw"].to_numpy(np.int64),
                            seg_pdf["dls_bw"].to_numpy(np.int64),
                            seg_pdf["ids"].to_numpy(),
                            seg_pdf["tfs"].to_numpy(),
                            seg_pdf["dls"].to_numpy())
                    n_a, ibw, tbw, dbw, ib, tb, db = cols_box[0]
                    s, e = term_rows[t]
                    # first/last are already base-relative; the delta-
                    # chain stitch only uses their differences plus the
                    # leading absolute start, so the decoded ids come
                    # out base-relative too (== pos) — bit-identical to
                    # a per-block decode loop, one unpack pass per
                    # (term, bit-width) instead of per block
                    pos, tfs, dls = decode_term_run(
                        ib[s:e], tb[s:e], db[s:e], ibw[s:e], tbw[s:e],
                        dbw[s:e], n_a[s:e], first[s:e], last[s:e])
                    hit = (pos, tfnorm_np(tfs, dls, avgdl, params))
                decoded_terms[t] = hit
            return hit

        scores = np.zeros(width, dtype=np.float64)   # reused per query
        diff = np.zeros(width + 1, dtype=np.float64)  # reused ub builder
        nmatch = np.zeros(width, dtype=np.int32) if count_matches else None

        out_q, out_d, out_s = [], [], []
        for qid, qterms, k, theta in queries:
            if assigned_ids is not None and qid not in assigned_ids:
                continue
            present = [t for t in qterms if t in term_rows]
            if not present:
                continue
            need = len(qterms) if require_all else min_match
            if count_matches and len(present) < need:
                # too few of the query's terms have postings in this
                # shard for any doc here to reach the match threshold
                # (qterms are distinct and corpus-present; a doc's
                # postings never span shards)
                continue
            # candidate mask from block metadata only (range-add + cumsum)
            # — a WORK-SAVER, not a correctness gate: docs below θ can
            # never enter the global top-k merge. Skipped for unpruned
            # scans (θ=None, no filter).
            cand = None
            if theta is not None:
                diff[:] = 0.0
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
                    continue  # whole shard provably below θ for this query
                ccum = np.concatenate([[0], np.cumsum(cand)])

            scores[:] = 0.0
            if count_matches:
                nmatch[:] = 0
            touched = False
            for t in present:  # sorted term order == oracle accumulation order
                s, e = term_rows[t]
                if ccum is not None and not np.any(
                        ccum[last[s:e] + 1] - ccum[first[s:e]]):
                    continue  # no candidate doc in any of this term's blocks
                pos, g = term_arrays(t)
                # within one term a doc appears once, so fancy-index +=
                # is safe and bit-identical to the per-block accumulation
                # (a dense cached-vector variant measured SLOWER under
                # real memory traffic: 64 KB read+write per term-add vs
                # the scatter's nnz-proportional footprint)
                scores[pos] += idf[t] * g
                if count_matches:
                    nmatch[pos] += 1
                touched = True
            if not touched:
                continue

            if cand is None:
                sel = np.flatnonzero(scores > 0)
            else:
                sel = np.flatnonzero(cand & (scores > 0))
            if count_matches and len(sel):
                # match-count gate: keep docs reaching the threshold
                # (AND: every distinct corpus-present query term; msm:
                # >= m of them). A term skipped by the candidate check
                # above was matched by no candidate doc, so the count
                # shortfall it causes is correct, never spurious.
                sel = sel[nmatch[sel] >= (len(present) if require_all
                                          else min_match)]
            if len(sel) == 0:
                continue
            vals = scores[sel]
            if k > 0 and len(sel) > 4 * k + 64:
                # O(n) pre-cut before the O(n log n) sort: keep every doc
                # scoring >= the k-th largest value (ties INCLUDED, so
                # the doc-asc tie-break below still sees them) — a hot
                # term makes |sel| thousands per shard and the full
                # lexsort was the scorer's top cost at large batches
                kth = np.partition(vals, len(vals) - k)[len(vals) - k]
                keep = vals >= kth
                sel, vals = sel[keep], vals[keep]
            order = np.lexsort((sel, -vals))[:k]
            top = sel[order]
            out_q.append(np.full(len(top), qid, dtype=np.int32))
            out_d.append(top.astype(np.int64) + base)
            out_s.append(vals[order])

        if not out_q:
            return empty_out
        return pd.DataFrame({
            "query_id": pd.Series(np.concatenate(out_q), dtype="int32"),
            "doc_id": pd.Series(np.concatenate(out_d), dtype="int64"),
            "score": pd.Series(np.concatenate(out_s), dtype="float64")})

    if has_aux:
        def fn(key, seg_pdf, aux_pdf):  # cogrouped variant
            return score_shard(seg_pdf, aux_pdf)
    else:
        def fn(seg_pdf):
            return score_shard(seg_pdf, None)
    fn.score_shard = score_shard
    return fn


def _payload_view(arr):
    """(padded data uint8, offsets int64[n+1]) view of a pyarrow
    Binary/String array — the per-cell payload bytes without ever
    materializing Python bytes objects. The data is copied once into a
    buffer padded with 8 zero bytes so the word-gather decode may read
    past the last cell."""
    import pyarrow as pa
    if arr.null_count:
        raise ValueError("segment payload column has nulls")
    large = pa.types.is_large_binary(arr.type) \
        or pa.types.is_large_string(arr.type)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1],
                        dtype=np.int64 if large else np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    end = int(off[-1])
    padded = np.zeros(end + 8, dtype=np.uint8)
    padded[:end] = data[:end]
    return padded, off


def _partition_scorer(payload: dict, arrow: bool = False):
    """mapInPandas / mapInArrow body: score a SCAN partition directly —
    no cogroup, no
    shuffle of the (large, binary) segment frame. Query->shard routing
    rides the closure (payload["routing"]: shard -> set(query_id), or
    None = every query scans every shard).

    Correctness under partition fragmentation: a document's postings for
    all terms live in ONE segment generation (docs are immutable; appends
    mint new ids) and one generation's (shard) rows live in one file (the
    encode shuffle wrote them together), so any doc's full score is
    computed within a single fragment. A shard split across fragments
    (base + delta dirs) yields per-fragment top-k lists whose union is a
    superset of the true shard top-k — exact after the global window
    merge. Files must not be split mid-ROW-GROUP by the reader: segment
    files hold exactly one row group (writer-verified, manifest
    `seg_single_rg`), and Spark assigns a parquet row group to the one
    byte-range split containing its midpoint — so even a file larger
    than maxPartitionBytes yields one real fragment plus empty phantom
    splits, never a torn shard. load() checks the flag."""
    routing = payload.get("routing")
    # anti_routing: shard -> set(query_id) to SKIP (already scored in the
    # seed phase) — lets the unrouted fallback reuse seed results instead
    # of rescoring seed shards (bounded: <= seed_shards x Q pairs)
    anti = payload.get("anti_routing")
    all_qids = {q for q, _, _, _ in payload["queries"]}
    kmap = {q: k for q, _, k, _ in payload["queries"]}
    base_fn = _shard_scorer(dict(payload, assigned=False), has_aux=False)
    score_shard = base_fn.score_shard
    avgdl_, params_ = payload["avgdl"], BM25Params(
        k1=payload["k1"], b=payload["b"])

    def _finish_lookup(terms_np, decoded, n_a):
        """Shared tail of the partition-level decode cache: term index
        over the (term, first_doc)-sorted rows + global value slices."""
        chg = np.nonzero(terms_np[1:] != terms_np[:-1])[0] + 1
        st = np.concatenate([[0], chg])
        en = np.concatenate([chg, [len(terms_np)]])
        ids_all, tfs_all, dls_all = decoded
        vend = np.cumsum(n_a)
        return ({str(terms_np[s]): (s, e) for s, e in zip(st, en)},
                ids_all,
                tfnorm_np(tfs_all, dls_all, avgdl_, params_),
                vend - n_a, vend)

    def _make_part_lookup(build_box):
        """term -> (absolute doc ids, tfnorm g) for the whole partition,
        decoded lazily ONCE for all terms. The delta-chain stitch is
        exact ACROSS term runs (the cumsum through the end of any block
        equals its last_doc, so the next run-leading block's patch
        first_doc[i] - last_doc[i-1] lands it at its absolute
        first_doc — the same int64 arithmetic per block as per-run
        decode calls, bit-identical). Paying unpack_rows' fixed cost
        3x per PARTITION instead of 3x per (term, partition) was
        measured at 4.0 of 5.1 CPU-s on a 200-query batch."""
        box: list = [None]
        pcache: dict[str, tuple] = {}

        def part_lookup(t: str):
            hit = pcache.get(t)
            if hit is None:
                if box[0] is None:
                    box[0] = build_box()
                (tidx, ids_all, g_all, vstart, vend) = box[0]
                se = tidx.get(t)
                if se is None:
                    hit = (np.empty(0, dtype=np.int64), np.empty(0))
                else:
                    s, e = se
                    a, b = int(vstart[s]), int(vend[e - 1])
                    hit = (ids_all[a:b], g_all[a:b])
                pcache[t] = hit
            return hit

        return part_lookup

    def _pandas_part_lookup(pdf):
        def build_box():
            ps = pdf.sort_values(["term", "first_doc"], kind="mergesort")
            n_a = ps["n"].to_numpy(np.int64)
            decoded = decode_term_run(
                ps["ids"].to_numpy(), ps["tfs"].to_numpy(),
                ps["dls"].to_numpy(),
                ps["ids_bw"].to_numpy(np.int64),
                ps["tfs_bw"].to_numpy(np.int64),
                ps["dls_bw"].to_numpy(np.int64),
                n_a,
                ps["first_doc"].to_numpy(np.int64),
                ps["last_doc"].to_numpy(np.int64))
            return _finish_lookup(ps["term"].to_numpy(), decoded, n_a)
        return _make_part_lookup(build_box)

    def _views_part_lookup(mpdf, views):
        """Arrow-mode lookup: mpdf is ALREADY (term, first_doc)-sorted
        (the table was sorted before the payload views were taken, so
        view cell order == mpdf row order) and payloads decode straight
        from the BinaryArray buffers — no Python bytes objects."""
        def build_box():
            n_a = mpdf["n"].to_numpy(np.int64)
            from pdx_spark.functions.blocks import decode_term_run_views
            decoded = decode_term_run_views(
                views[0], views[1], views[2],
                mpdf["ids_bw"].to_numpy(np.int64),
                mpdf["tfs_bw"].to_numpy(np.int64),
                mpdf["dls_bw"].to_numpy(np.int64),
                n_a,
                mpdf["first_doc"].to_numpy(np.int64),
                mpdf["last_doc"].to_numpy(np.int64))
            return _finish_lookup(mpdf["term"].to_numpy(), decoded, n_a)
        return _make_part_lookup(build_box)

    def score_partition(pdf, part_lookup):
        parts = []
        for _, grp in pdf.groupby("shard", sort=False):
            sh = int(grp["shard"].iloc[0])
            if routing is not None:
                qids = routing.get(sh)
                if not qids:
                    continue
                out = score_shard(grp, None, assigned_override=qids,
                                  part_lookup=part_lookup)
            elif anti is not None and sh in anti:
                qids = all_qids - anti[sh]
                if not qids:
                    continue
                out = score_shard(grp, None, assigned_override=qids,
                                  part_lookup=part_lookup)
            else:
                out = score_shard(grp, None, part_lookup=part_lookup)
            if len(out):
                parts.append(out)
        if not parts:
            return None
        # per-PARTITION top-k per query: cuts merge input from
        # (shards x Q x k) to (partitions x Q x k) rows — the downstream
        # merge (driver or window) then sorts thousands, not millions
        allp = parts[0] if len(parts) == 1 else pd.concat(parts,
                                                          ignore_index=True)
        q = allp["query_id"].to_numpy()
        d = allp["doc_id"].to_numpy()
        sc = allp["score"].to_numpy()
        order = np.lexsort((d, -sc, q))  # by query, score desc, doc asc
        qs, ds, scs = q[order], d[order], sc[order]
        keep = np.zeros(len(qs), dtype=bool)
        starts = np.concatenate(
            [[0], np.nonzero(qs[1:] != qs[:-1])[0] + 1, [len(qs)]])
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            keep[s:min(e, s + kmap.get(int(qs[s]), 10))] = True
        return pd.DataFrame({"query_id": pd.Series(qs[keep], dtype="int32"),
                             "doc_id": pd.Series(ds[keep], dtype="int64"),
                             "score": pd.Series(scs[keep], dtype="float64")})

    if not arrow:
        def fn(batches):
            pdfs = [p for p in batches if len(p)]
            if not pdfs:
                return
            pdf = pdfs[0] if len(pdfs) == 1 \
                else pd.concat(pdfs, ignore_index=True)
            out = score_partition(pdf, _pandas_part_lookup(pdf))
            if out is not None:
                yield out
        return fn

    def fn(batches):
        """mapInArrow body: the (large, binary) payload columns never
        become pandas bytes objects — the table is sorted in C++ and the
        scorer decodes straight from the BinaryArray buffers; only the
        slim metadata columns cross into pandas."""
        import pyarrow as pa
        import pyarrow.compute as pc
        bl = [b for b in batches if b.num_rows]
        if not bl:
            return
        tab = pa.Table.from_batches(bl)
        # Arrow string sort is byte-lexicographic == Python str order
        # for these ASCII tokens; (term, first_doc) is unique per row,
        # so the order is deterministic
        tab = tab.take(pc.sort_indices(
            tab, sort_keys=[("term", "ascending"),
                            ("first_doc", "ascending")])).combine_chunks()
        views = tuple(_payload_view(tab.column(c).chunk(0))
                      for c in ("ids", "tfs", "dls"))
        mpdf = tab.drop_columns(["ids", "tfs", "dls"]).to_pandas()
        out = score_partition(mpdf, _views_part_lookup(mpdf, views))
        if out is not None and len(out):
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return fn


class Searcher:
    """Loaded index handle (analog of the restored PDX index +
    PDXearch searcher, index.hpp:241-267)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.fs = index_fs(spark, path)
        self.manifest = read_manifest(path, fs=self.fs)
        fv = self.manifest.get("format_version", 1)
        if fv != IndexConfig.format_version:
            # v1 indexes lack the u8-quantized directory columns; loading
            # one silently collapses every pruning bound to 0 — refuse
            # loudly instead (the reference factory's format tag role)
            raise ValueError(
                f"index at {path} has format_version={fv}, this engine "
                f"reads v{IndexConfig.format_version}; rebuild the index "
                f"(Indexer.build) or compact it with a matching engine")
        p = self.manifest["params"]
        self.params = BM25Params(**p["bm25"])
        self.cfg = IndexConfig(**p["layout"])
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]
        self._sel_sample = None  # cached docs sample for selectivity est.
        self._last_sel_frac: float | None = None  # last predicate pass-rate
        self._idf_cache: dict[str, float] = {}  # term -> idf (load-time N)
        # warm two-phase planning: the deduplicated, dequantized directory
        # frame persists on first use so later batches plan from executor
        # cache instead of re-reading (and re-merging) the directory
        # parquet every time
        self._dir_df: DataFrame | None = None
        # driver-side planning cache: term -> (shards, admissible tfnorm
        # bound) from the directory parquet (see _plan_slice)
        self._plan_cache: dict[str, tuple] = {}
        self._plan_disabled = False
        # outcome feedback for the adaptive planner: consecutive batches
        # whose θ could not prune (unrouted fallback) — after
        # _UNROUTED_BYPASS of them, skip the seed phase entirely and
        # re-probe two-phase every _BYPASS_REPROBE batches (runtime
        # adaptivity in the spirit of the reference's selectivity-
        # adaptive scan switch, searcher.hpp:321-345)
        self._unrouted_streak = 0
        self._bypassed = 0
        self._bypass_started: float | None = None  # monotonic, 1st bypass
        self._manifest_fp = self._manifest_fingerprint()
        # workload key for the bypass: smallest live-query count among the
        # batches that fell back — bypass applies only to batches of
        # comparable-or-larger size, so a stream of small selective
        # queries after two big unselective batches still gets two-phase
        # pruning (ADVICE r3: don't make the streak global)
        self._unrouted_min_live: int | None = None
        # populated by every search_batch: which physical strategy ran
        # ({mode: exhaustive|routed|unrouted|cogroup, ...counts}) — the
        # observability hook ops dashboards and tests read
        self.last_plan: dict = {}
        self._map_scan_ok = self._verify_scan_granularity()
        self._seg_bytes: int | None = None  # lazy, see _segment_bytes

    def _manifest_fingerprint(self) -> str:
        """Cheap generation token for the on-disk manifest (a small JSON
        read). Unreadable manifest -> '' so a transient fs error never
        crashes planning; '' != loaded fp just triggers a re-probe."""
        try:
            import hashlib
            from pdx_spark.fs import IndexFS
            text = self.fs.read_text(IndexFS.join(self.path, MANIFEST))
            return hashlib.md5(text.encode()).hexdigest()
        except Exception:
            return ""

    def _bypass_expired(self) -> bool:
        """Should the seed-phase bypass re-probe two-phase NOW? Yes after
        _BYPASS_REPROBE bypassed batches, after _BYPASS_REPROBE_SECS wall
        seconds, or when the on-disk manifest changed since load
        (append/compact bumps it — a grown corpus may have become
        prunable). The manifest read only happens while bypassing, so
        steady-state two-phase batches pay nothing."""
        if self._bypassed >= _BYPASS_REPROBE:
            return True
        if (self._bypass_started is not None
                and time.monotonic() - self._bypass_started
                > _BYPASS_REPROBE_SECS):
            return True
        fp = self._manifest_fingerprint()
        if fp != self._manifest_fp:
            self._manifest_fp = fp
            return True
        return False

    def _segment_bytes(self) -> int:
        """Total on-disk bytes of the segment files (base + deltas),
        listed once per Searcher through the fs seam. Used only to SIZE
        routed-scan tasks (never for correctness); a listing failure
        caches 0, which disables the byte cap."""
        if self._seg_bytes is None:
            try:
                files = [
                    sz for d in self.manifest["segment_dirs"]
                    + self.manifest.get("deltas", [])
                    for _, sz in self.fs.parquet_files(
                        self.fs.join(self.path, d))]
                self._seg_bytes = sum(files)
                self._seg_files = len(files)
            except Exception:
                self._seg_bytes = 0
                self._seg_files = 0
        return self._seg_bytes

    def _segment_file_count(self) -> int:
        self._segment_bytes()
        return self._seg_files

    def _routed_task_count(self, n_routed_shards: int) -> int:
        """Task count for a routed scan: at most one task per routed
        shard, never more than defaultParallelism, and never more tasks
        than the routed BYTE slice justifies (each python task has a
        fixed ~0.2 CPU-s cost, so a few-MB routed slice should run as
        1-2 tasks even on a 32-core box — the round-5 pruning bench
        measured the task overhead alone flipping the routed path from
        a CPU win to a 2x CPU loss on a 28 MB index). Routed bytes are
        estimated as the routed shard fraction of the total segment
        bytes; shards are near-uniform by construction (dense doc_ids,
        fixed docs_per_shard)."""
        n_shards_total = max(1, -(-self.n_docs // self.cfg.docs_per_shard))
        n = max(1, min(self.spark.sparkContext.defaultParallelism,
                       n_routed_shards))
        total = self._segment_bytes()
        if total > 0:
            routed = total * min(n_routed_shards, n_shards_total) \
                / n_shards_total
            n = min(n, max(1, -(-int(routed) // _ROUTED_TASK_BYTES)))
        return n

    def _verify_scan_granularity(self) -> bool:
        """The shuffle-free map-scan is exact only if the reader never
        splits a segment file mid-file (a doc's term rows would fragment
        and partial BM25 scores would merge wrong). Spark splits parquet
        files at ROW-GROUP granularity, so the real invariant is: every
        segment file holds exactly ONE row group (writers enforce it via
        parquet.block.size >> file size and verify with pyarrow; the
        manifest carries the verdict per build/append/compact).

        Returns True only when the invariant is PROVEN — via the manifest
        flag writers record after verifying their own output, or by
        re-reading footers here (pyarrow locally, parquet-hadoop on any
        other scheme). A violating file returns False and search falls
        back to the cogroup scan, which groups by shard explicitly and
        is exact under any file layout."""
        if self.manifest.get("seg_single_rg") is True:
            return True
        return all(
            verify_single_rowgroup(self.fs, d, root=self.path)
            for d in self.manifest["segment_dirs"]
            + self.manifest.get("deltas", []))

    @classmethod
    def load(cls, spark, path: str) -> "Searcher":
        return cls(spark, path)

    # -- lazy frames (merged views over base + maintenance deltas) ----------
    def segments(self) -> DataFrame:
        # one lazy frame per Searcher: a Searcher is a snapshot of one
        # manifest, so the frame (and Spark's file-listing cache inside
        # it) is reused across batches instead of re-listing the segment
        # dirs on every query — per-batch serial latency, at 10^5 files
        # a real planning cost
        if getattr(self, "_seg_frame", None) is None:
            excl = self.manifest.get("seg_excludes", {})
            dirs = self.manifest["segment_dirs"] \
                + self.manifest.get("deltas", [])
            if not any(excl.get(d) for d in dirs):
                # one multi-path scan instead of a Union of per-dir
                # scans: same rows, but a single scan node — smaller
                # plan, one whole-stage-codegen compile (a fresh
                # post-append Searcher paid ~0.4 s of first-batch
                # codegen on the union plan), one task pool
                self._seg_frame = (
                    self.spark.read.schema(schemas.SEGMENTS)
                    .option("recursiveFileLookup", "true")
                    .parquet(*[self.fs.join(self.path, d) for d in dirs]))
                return self._seg_frame
            df = None
            for d in dirs:
                part = (self.spark.read.schema(schemas.SEGMENTS)
                        .option("recursiveFileLookup", "true")
                        .parquet(self.fs.join(self.path, d)))
                ex = excl.get(d)
                if ex:  # shards superseded by a targeted-compaction patch
                    part = part.filter(
                        ~F.col("shard").isin([int(s) for s in ex]))
                df = part if df is None else df.unionByName(part)
            self._seg_frame = df
        return self._seg_frame

    def docs(self) -> DataFrame:
        df = None
        for d in self.manifest.get("docs_dirs", ["docs"]):
            part = self.spark.read.schema(schemas.DOCS).parquet(
                self.fs.join(self.path, d))
            df = part if df is None else df.unionByName(part)
        if self.manifest.get("dead_docs", 0) > 0:
            dead = self.spark.read.parquet(
                self.fs.join(self.path,
                             self.manifest.get("dead_dir", "dead_docs"))
            ).select("doc_id")
            df = df.join(dead, "doc_id", "left_anti")
        return df

    def term_stats(self) -> DataFrame:
        """Base ∪ append/delete deltas, merged at read: df sums (delete
        deltas are negative), bounds take max (stale-high = admissible).
        The per-query idf lookup filters on `term` FIRST, so parquet
        row-group pruning applies to every delta file before the merge
        agg touches anything."""
        base = self.spark.read.schema(schemas.TERM_STATS).parquet(
            self.fs.join(self.path,
                         self.manifest.get("ts_base", "term_stats")))
        deltas = self.manifest.get("ts_deltas", [])
        if not deltas:
            return base
        df = base
        for d in deltas:
            part = self.spark.read.schema(schemas.TERM_STATS).parquet(
                self.fs.join(self.path, d))
            df = df.unionByName(part)
        return (df.groupBy("term")
                .agg(F.sum("df").alias("df"),
                     F.max("max_tf").alias("max_tf"),
                     F.max("gmax").alias("gmax"))
                .filter(F.col("df") > 0))

    def directory(self) -> DataFrame:
        """Base ∪ append deltas, with u8 bound metadata dequantized back
        to (max_tf, min_dl) doubles using each dir's own affine params
        (manifest["dir_quant"]). Ceil/floor quantization makes the
        dequantized pair stale-high/stale-low => the bound computed from
        it is admissible (never under-estimates a true score)."""
        from pdx_spark.functions.quantize import dequantize_col
        dq = self.manifest.get("dir_quant", {})

        def read_one(d: str) -> DataFrame:
            p = dq.get(d, {"tf_base": 0.0, "tf_scale": 0.0,
                           "dl_base": 0.0, "dl_scale": 0.0})
            part = self.spark.read.schema(schemas.DIRECTORY).parquet(
                self.fs.join(self.path, d))
            return part.select(
                "term", "shard", "n_blocks", "n_postings",
                dequantize_col(F.col("max_tf_q"), p["tf_base"],
                               p["tf_scale"]).alias("max_tf"),
                dequantize_col(F.col("min_dl_q"), p["dl_base"],
                               p["dl_scale"]).alias("min_dl"))

        df = read_one(self.manifest.get("dir_base", "directory"))
        for d in self.manifest.get("dir_deltas", []):
            df = df.unionByName(read_one(d))
        return df

    def tombstones(self) -> DataFrame | None:
        # generation-named tombstone dir, resolved THROUGH the manifest
        # (visibility = manifest commit; a staged-but-uncommitted merge
        # is invisible, so delete() replays are exact — see
        # maintenance.delete)
        if self.manifest.get("tombstones", 0) > 0:
            d = self.manifest.get("tomb_dir", "tombstones")
            return self.spark.read.parquet(self.fs.join(self.path, d))
        return None

    # -- public API ----------------------------------------------------------
    def search(self, query_text: str, k: int = 10, *, exact: bool = False,
               predicate: str | None = None,
               require_all_terms: bool = False,
               min_should_match: int = 1) -> list[tuple[int, float]]:
        df = self.search_batch([(0, query_text, k)], exact=exact,
                               predicate=predicate,
                               require_all_terms=require_all_terms,
                               min_should_match=min_should_match)
        rows = df.orderBy(F.desc("score"), F.asc("doc_id")).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def search_batch(self, queries: list[tuple[int, str, int]], *,
                     exact: bool = False, predicate: str | None = None,
                     seed_shards: int = 2,
                     two_phase_min_shards: int = 64,
                     force_two_phase: bool = False,
                     require_all_terms: bool = False,
                     min_should_match: int = 1) -> DataFrame:
        """-> DataFrame(query_id, doc_id, score), per-query top-k
        (materialized — result sets are tiny, <= Σ k).

        exact=True forces the exhaustive blocked scan (nprobe=0 analog,
        searcher.hpp:614-616). Otherwise, when the index has enough
        shards for shard-skipping to pay for a second job, the θ-seeded
        two-phase scan runs: planning, candidate routing, and the result
        merge all stay Spark-side; the driver sees only the k-th seed
        score per query (θ) and the final Σk rows. Results are
        rank-identical either way; only the work differs. The adaptive
        choice mirrors the reference's selectivity-adaptive scan
        branches (searcher.hpp:321-345)."""
        tm: dict[str, float] = {}
        _t0 = time.time()
        parsed = []
        for qid, qtext, k in queries:
            terms = sorted(set(tokenize_py(qtext)))
            parsed.append((int(qid), terms, int(k)))
        all_terms = sorted({t for _, ts, _ in parsed for t in ts})
        empty = self.spark.createDataFrame([], schemas.RESULTS)
        if not all_terms:
            self.last_plan = {"mode": "empty"}
            return empty

        idf = self._idf_lookup(all_terms)
        tm["idf"] = round(time.time() - _t0, 3)
        # conjunctive (AND) semantics: every query term must match. A
        # query with an OOV/dead term can match nothing — drop it HERE
        # (the per-shard absent-term check below only sees terms that
        # exist somewhere). Exact per shard because doc-range sharding
        # puts all of a doc's postings in one shard; θ pruning stays
        # admissible because the OR upper bound >= the AND score.
        # min_should_match generalizes both: OR is m=1, AND is m=n. m
        # counts matched distinct query terms; a query whose
        # corpus-present term count falls below m can match nothing.
        self._require_all = bool(require_all_terms)
        self._min_match = max(int(min_should_match), 1)
        if require_all_terms:
            live = [(q, ts, k) for q, ts, k in parsed
                    if all(t in idf for t in ts)]
        else:
            live = [(q, [t for t in ts if t in idf], k)
                    for q, ts, k in parsed]
        live = [(q, ts, k) for q, ts, k in live
                if len(ts) >= self._min_match and ts]
        if not live:
            self.last_plan = {"mode": "empty"}  # every term OOV/dead
            return empty
        all_terms = sorted({t for _, ts, _ in live for t in ts})

        seg = self.segments().filter(_in_list("term", all_terms))
        mask_df, pred_mode = self._mask_df(predicate)
        closure_mask = None
        if mask_df is not None and self._map_scan_ok:
            closure_mask = self._collect_small_mask(mask_df, pred_mode)
            if closure_mask is not None:
                # small mask rides the scorer closure: every branch below
                # keeps the shuffle-free map scan + driver planning, the
                # plans a filtered batch used to forfeit (cogroup +
                # groupBy-shuffle of the term-filtered segment rows)
                mask_df = None

        n_shards_total = -(-self.n_docs // self.cfg.docs_per_shard)
        # exhaustive when pruning cannot pay: too few shards for skipping
        # to matter, or the BATCH is so large that the seed phase alone
        # would touch ~every shard (Q x seed_shards >= shards means the
        # seed scan is already one full pass of I/O; the main scan would
        # be a second). Work-based, not corpus-based — the same batch
        # size picks two-phase on a bigger index. force_two_phase
        # overrides (tests/bench exercise the pruned path explicitly).
        big_batch = len(live) * seed_shards >= n_shards_total
        bypass = False
        if self._unrouted_streak >= _UNROUTED_BYPASS:
            if self._bypass_expired():
                self._unrouted_streak = 0  # re-probe two-phase
                self._bypassed = 0
                self._bypass_started = None
            elif (self._unrouted_min_live is None
                    or 2 * len(live) >= self._unrouted_min_live):
                # bypass only batches that RESEMBLE the ones that fell
                # back (size-keyed): a much smaller batch prunes
                # differently and deserves its own two-phase probe
                bypass = True
                self._bypassed += 1
                if self._bypass_started is None:
                    self._bypass_started = time.monotonic()
        if exact or (not force_two_phase
                     and (n_shards_total < max(two_phase_min_shards,
                                               4 * seed_shards)
                          or big_batch or bypass)):
            self.last_plan = {"mode": "exhaustive",
                              "n_shards": n_shards_total,
                              "big_batch": big_batch,
                              "unrouted_bypass": bypass,
                              "mask_in_closure": closure_mask is not None}
            qspec = [(q, ts, k, None) for q, ts, k in live]
            if mask_df is None:
                res = self._map_scan(seg, qspec, idf, mask=closure_mask)
                if self._map_scan_ok and self._merge_bound_ok(live):
                    # per-partition top-k collected and merged on the
                    # driver: one stage, no exchange/window, free count
                    return self._merge_topk_local(res, live)
            else:
                res = self._scan(seg, qspec, idf, mask_df, pred_mode)
            return self._global_topk(res, live)

        # ---- plan (S2/S3 analog): per-(query, shard) upper bounds from
        # the directory slice of the query terms. DRIVER-PLANNED on local
        # indexes (pyarrow slice + numpy — the directory is metadata, the
        # reference ranks it in-process, searcher.hpp:181-215; saves two
        # Spark jobs of serial latency per batch); DISTRIBUTED (ub_df)
        # on remote indexes, oversized slices, or masked batches.
        _t0 = time.time()
        ub_df = q_ub = None
        plan_terms = self._plan_slice(all_terms) if mask_df is None else None
        if plan_terms is not None:
            q_ub = {}
            potential = 0
            for q, ts, _k in live:
                shs, contribs = [], []
                feas = None  # AND: shards where EVERY term has postings
                for t in ts:
                    sh_t, g_t = plan_terms[t]
                    if require_all_terms:
                        feas = sh_t if feas is None else np.intersect1d(
                            feas, sh_t, assume_unique=True)
                    if len(sh_t):
                        shs.append(sh_t)
                        contribs.append(idf[t] * g_t)
                if not shs:
                    continue
                sh = np.concatenate(shs)
                contrib = np.concatenate(contribs)
                ush, inv = np.unique(sh, return_inverse=True)
                ub = np.zeros(len(ush))
                np.add.at(ub, inv, contrib)
                if require_all_terms:
                    # conjunctive routing: only the intersection can
                    # match all terms — the textbook AND shard prune
                    # (the scorer's per-shard gate makes this a pure
                    # work-saver, never a correctness dependency)
                    keep = np.isin(ush, feas, assume_unique=True)
                    ush, ub = ush[keep], ub[keep]
                    if not len(ush):
                        continue
                q_ub[int(q)] = (ush, ub)
                potential += len(ush)
            if potential > _ROUTING_CAP:
                q_ub = None  # routing would not fit the driver anyway

        if q_ub is not None:
            seed_set = set()
            for q, (ush, ub) in q_ub.items():
                order = np.lexsort((ush, -ub))[:seed_shards]
                seed_set.update((q, int(ush[i])) for i in order)
            tm["plan_ub"] = round(time.time() - _t0, 3)
        else:
            qt_rows = [(int(q), t, float(idf[t]))
                       for q, ts, _ in live for t in ts]
            qterms = _pdf_df(self.spark, {
                "query_id": pd.Series([r[0] for r in qt_rows], dtype="int32"),
                "term": pd.Series([r[1] for r in qt_rows], dtype=object),
                "idf": pd.Series([r[2] for r in qt_rows], dtype="float64")},
                "query_id int, term string, idf double")
            if self._dir_df is None:
                bounds = self.directory().select(
                    "term", "shard", "max_tf", "min_dl")
                if self.manifest.get("dir_deltas"):
                    # base + append-delta rows can repeat a (term, shard)
                    # key; collapse to one admissible bound so ub isn't
                    # inflated. (Delta-free indexes skip this shuffle.)
                    bounds = (bounds.groupBy("term", "shard")
                              .agg(F.max("max_tf").alias("max_tf"),
                                   F.min("min_dl").alias("min_dl")))
                # warm-Searcher cache: later batches plan against the
                # executor-cached (deduped, dequantized) directory instead
                # of re-reading + re-merging parquet per batch
                self._dir_df = bounds.persist()
            bounds = self._dir_df.filter(_in_list("term", all_terms))
            ub_df = (bounds
                     .join(F.broadcast(qterms), "term")
                     .withColumn("contrib", F.col("idf") * tfnorm_col(
                         F.col("max_tf"), F.col("min_dl"),
                         F.lit(float(self.avgdl)), self.params))
                     .groupBy("query_id", "shard")
                     .agg(F.sum("contrib").alias("ub"))
                     .filter(F.col("ub") > 0)
                     .persist())

            # seed selection distributed: each query's most promising
            # shards; only the tiny (<= seed_shards x Q) pair set is
            # collected.
            wseed = Window.partitionBy("query_id").orderBy(F.desc("ub"),
                                                           F.asc("shard"))
            seed_pairs = (ub_df.withColumn("_rn", F.row_number().over(wseed))
                          .filter(F.col("_rn") <= seed_shards)
                          .select("query_id", "shard").collect())
            tm["plan_ub"] = round(time.time() - _t0, 3)
            seed_set = {(int(r["query_id"]), int(r["shard"]))
                        for r in seed_pairs}
        seed_routing: dict[int, set] = {}
        for q, sh in seed_set:
            seed_routing.setdefault(sh, set()).add(q)
        _seed_ts: dict[str, set] = {}
        _qterms = {q: ts for q, ts, _ in live}
        for q, sh in seed_set:
            for t in _qterms[q]:
                _seed_ts.setdefault(t, set()).add(sh)
        _seed_expr = _term_shard_filter(_seed_ts, seed_routing)
        seed_seg = seg.filter(_seed_expr) if _seed_expr is not None \
            else seg.filter(_shard_filter(seed_routing))
        qspec0 = [(q, ts, k, None) for q, ts, k in live]
        if mask_df is None:
            seed_res = self._map_scan(seed_seg, qspec0, idf,
                                      routing=seed_routing,
                                      mask=closure_mask)
        else:
            seed_asg = self.spark.createDataFrame(
                sorted(seed_set), "query_id int, shard long")
            seed_res = self._scan(seed_seg, qspec0, idf, mask_df, pred_mode,
                                  asg_df=seed_asg)

        # ---- seed top-k + θ in ONE job: collect the per-query top-k over
        # the seed shards (bounded: <= Σk rows). θ (the k-th seed score,
        # searcher.hpp:82-91's threshold role) falls out driver-side, and
        # the rows themselves are REUSED as the seed contribution to the
        # final merge — the seed scan is never thrown away or re-run.
        _t0 = time.time()
        if mask_df is None and self._map_scan_ok \
                and self._merge_bound_ok(live):
            # bounded per-partition top-k -> one collect stage, driver
            # merge (no exchange/window job in the seed phase)
            seed_pdf = self._topk_merge_pdf([seed_res.toPandas()], live)
        else:
            seed_pdf = self._global_topk(seed_res, live).toPandas()
        tm["seed_scan"] = round(time.time() - _t0, 3)
        seed_rows = list(zip(seed_pdf["query_id"].astype(int),
                             seed_pdf["doc_id"].astype(int),
                             seed_pdf["score"].astype(float)))
        n_seed_hits: dict[int, int] = {}
        worst: dict[int, float] = {}
        for q, _, s in seed_rows:
            n_seed_hits[q] = n_seed_hits.get(q, 0) + 1
            worst[q] = min(worst.get(q, s), s)
        theta = {q: worst[q] for q, _, k in live
                 if n_seed_hits.get(q, 0) >= k}
        seed_df = _pdf_df(self.spark, {
            "query_id": pd.Series([r[0] for r in seed_rows], dtype="int32"),
            "doc_id": pd.Series([r[1] for r in seed_rows], dtype="int64"),
            "score": pd.Series([r[2] for r in seed_rows], dtype="float64")},
            schemas.RESULTS)

        # ---- main scan over (query, shard) pairs that can still beat θ.
        # Driver-planned: the survivor set falls out of the in-memory ub
        # vectors (zero Spark jobs). Distributed: ONE bounded collect
        # (limit CAP+1) both sizes the survivor set and fetches the
        # routing when it is small. At most CAP+1 rows ever reach the
        # driver; if the limit is hit, routing goes through the cogroup
        # channel (or the unrouted pass) instead.
        main_asg = None
        if q_ub is not None:
            pairs = []
            for q, (ush, ub) in q_ub.items():
                th = theta.get(q)
                keep = ush if th is None else \
                    ush[ub >= th - _THETA_GUARD * abs(th)]
                pairs.extend((q, int(x)) for x in keep)
            n_main = len(pairs)
            tm["routing_peek"] = 0.0
        else:
            theta_df = _pdf_df(self.spark, {
                "query_id": pd.Series([q for q in theta], dtype="int32"),
                "theta": pd.Series([theta[q] for q in theta],
                                   dtype="float64")},
                "query_id int, theta double")
            main_asg = (ub_df.join(F.broadcast(theta_df), "query_id", "left")
                        .filter(F.col("theta").isNull()
                                | (F.col("ub") >= F.col("theta")
                                   - F.lit(_THETA_GUARD)
                                   * F.abs(F.col("theta"))))
                        .select("query_id", "shard")).persist()
            _t0 = time.time()
            peek = main_asg.limit(_ROUTING_CAP + 1).collect()
            tm["routing_peek"] = round(time.time() - _t0, 3)
            n_main = len(peek)  # == true count unless the limit was hit
            if n_main <= _ROUTING_CAP:
                pairs = [(int(r["query_id"]), int(r["shard"]))
                         for r in peek]
        qspec1 = [(q, ts, k, theta.get(q)) for q, ts, k in live]

        if mask_df is None and n_main > 0.5 * len(live) * n_shards_total:
            # Pruning is ineffective (uniform shards: bounds beat θ almost
            # everywhere) — per-pair routing would ship ~Q x shards pairs
            # to save nothing. Run ONE unrouted pass with per-query θ
            # (classic WAND with a warmed heap), SKIPPING the seed pairs
            # in the scorer (anti-routing, <= seed_shards x Q entries in
            # the closure): the collected seed top-k supplies those
            # shards' contribution, so no (query, doc) is scored twice
            # and the seed work is reused, not discarded.
            self.last_plan = {"mode": "unrouted", "n_main": n_main,
                              "n_shards": n_shards_total,
                              "n_queries": len(live),
                              "mask_in_closure": closure_mask is not None}
            self._unrouted_streak += 1
            self._unrouted_min_live = min(
                self._unrouted_min_live or (1 << 30), len(live))
            res = self._map_scan(seg, qspec1, idf, anti_routing=seed_routing,
                                 mask=closure_mask)
            if self._map_scan_ok and self._merge_bound_ok(live):
                out = self._merge_topk_local(res, live, extra_pdf=seed_pdf)
            else:
                out = self._global_topk(seed_df.unionByName(res), live)
        elif mask_df is None and n_main <= _ROUTING_CAP:
            routing: dict[int, set] = {}
            for q, sh in pairs:
                if (q, sh) not in seed_set:  # seed shards already scored
                    routing.setdefault(sh, set()).add(q)
            self.last_plan = {"mode": "routed", "n_main": n_main,
                              "n_main_shards": len(routing),
                              "n_shards": n_shards_total,
                              "n_queries": len(live),
                              "mask_in_closure": closure_mask is not None}
            self._unrouted_streak = 0
            self._unrouted_min_live = None
            if routing:
                qterms_of = {q: ts for q, ts, _ in live}
                term_shards: dict[str, set] = {}
                for q, sh in pairs:
                    if (q, sh) in seed_set:
                        continue
                    for t in qterms_of[q]:
                        term_shards.setdefault(t, set()).add(sh)
                tf_expr = _term_shard_filter(term_shards, routing)
                main_seg = seg.filter(tf_expr) if tf_expr is not None \
                    else seg.filter(_shard_filter(routing))
                main_res = self._map_scan(main_seg, qspec1, idf,
                                          routing=routing,
                                          mask=closure_mask)
                if self._map_scan_ok and self._merge_bound_ok(live):
                    out = self._merge_topk_local(main_res, live,
                                                 extra_pdf=seed_pdf)
                else:
                    out = self._global_topk(
                        seed_df.unionByName(main_res), live)
            else:
                # every surviving pair was a seed pair: the collected
                # seed top-k IS the answer — zero further jobs
                out = seed_df
        else:
            # mask present, or routing too large for the driver: ship
            # routing through the cogroup channel (never collected)
            self.last_plan = {"mode": "cogroup", "n_main": n_main,
                              "n_shards": n_shards_total,
                              "n_queries": len(live)}
            self._unrouted_streak = 0
            self._unrouted_min_live = None
            seed_asg = self.spark.createDataFrame(
                sorted(seed_set), "query_id int, shard long")
            main_routed = main_asg.join(seed_asg, ["query_id", "shard"],
                                        "left_anti")
            main_seg = seg.join(
                F.broadcast(main_routed.select("shard").distinct()),
                "shard", "left_semi")
            main_res = self._scan(main_seg, qspec1, idf, mask_df, pred_mode,
                                  asg_df=main_routed)
            out = self._materialize(
                self._global_topk(seed_df.unionByName(main_res), live))

        if ub_df is not None:
            ub_df.unpersist()
        if main_asg is not None:
            main_asg.unpersist()
        self.last_plan["timings"] = tm
        self.last_plan["driver_planned"] = q_ub is not None
        return out

    def _plan_slice(self, terms: list[str]) -> dict | None:
        """term -> (shards int64[], admissible tfnorm bound float64[])
        for the query terms, read DRIVER-SIDE from the directory parquet
        via pyarrow (term-filtered; the directory is range-partitioned
        by term, so footers prune the read to the queried row groups).

        This is the reference's actual shape — the cluster directory is
        metadata, orders of magnitude smaller than the index
        (searcher.hpp:181-215 ranks it in-process) — and it removes two
        Spark jobs of serial latency from every two-phase batch (the
        ub_df plan job and the routing peek). Bounded: returns None (→
        distributed ub_df planning) on a remote fs or when the slice
        exceeds _PLAN_SLICE_CAP rows. Cached per term on the warm
        Searcher, like idf."""
        if self._plan_disabled or not self.fs.is_local:
            return None
        missing = [t for t in terms if t not in self._plan_cache]
        if missing:
            import pyarrow.dataset as ds

            from pdx_spark.functions.quantize import dequantize_np
            dq = self.manifest.get("dir_quant", {})
            zero = {"tf_base": 0.0, "tf_scale": 0.0,
                    "dl_base": 0.0, "dl_scale": 0.0}
            dirs = [self.manifest.get("dir_base", "directory")] \
                + self.manifest.get("dir_deltas", [])
            frames, total = [], 0
            for d in dirs:
                p = dq.get(d, zero)
                dset = ds.dataset(self.fs.join(self.path, d),
                                  format="parquet")
                tab = dset.to_table(
                    columns=["term", "shard", "max_tf_q", "min_dl_q"],
                    filter=ds.field("term").isin(missing))
                total += tab.num_rows
                if total > _PLAN_SLICE_CAP:
                    self._plan_disabled = True  # hot terms x huge index
                    return None
                pdf = tab.to_pandas()
                pdf["max_tf"] = dequantize_np(
                    pdf["max_tf_q"].to_numpy(), p["tf_base"], p["tf_scale"])
                pdf["min_dl"] = dequantize_np(
                    pdf["min_dl_q"].to_numpy(), p["dl_base"], p["dl_scale"])
                frames.append(pdf[["term", "shard", "max_tf", "min_dl"]])
            allp = frames[0] if len(frames) == 1 else pd.concat(
                frames, ignore_index=True)
            if len(dirs) > 1:
                # delta dirs can repeat a (term, shard) key; collapse to
                # one admissible bound (same as the ub_df dedup)
                allp = allp.groupby(["term", "shard"], as_index=False) \
                    .agg(max_tf=("max_tf", "max"), min_dl=("min_dl", "min"))
            for t, grp in allp.groupby("term", sort=False):
                g = tfnorm_np(grp["max_tf"].to_numpy(),
                              grp["min_dl"].to_numpy(),
                              self.avgdl, self.params)
                self._plan_cache[str(t)] = (
                    grp["shard"].to_numpy(dtype=np.int64), g)
            for t in missing:  # absent terms cache as empty
                self._plan_cache.setdefault(
                    t, (np.empty(0, dtype=np.int64), np.empty(0)))
        return {t: self._plan_cache[t] for t in terms}

    def expand_prefix(self, prefix: str, cap: int = 64) -> list[str]:
        """Vocabulary terms starting with `prefix`, for prefix/wildcard
        queries (`search_batch([(0, " ".join(terms), k)])` then scores
        the expansion as a BM25 OR — Lucene's scoring-BooleanQuery
        rewrite). term_stats is written term-sorted, so on a local index
        the expansion is a pyarrow RANGE read ([prefix, prefix+1) in
        byte order) pruned by row-group stats — a metadata lookup, not a
        vocabulary scan; remote indexes use the Spark merged view with
        the same range predicate. Raises if the expansion exceeds `cap`
        (an unanchored prefix on a web vocabulary is a user error, not
        a silent 10^6-term query)."""
        if not prefix or not (prefix.isascii() and prefix.isalnum()):
            raise ValueError(f"prefix must be a token prefix: {prefix!r}")
        prefix = prefix.lower()
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        dirs = [self.manifest.get("ts_base", "term_stats")] \
            + self.manifest.get("ts_deltas", [])
        terms: set[str] = set()
        if self.fs.is_local:
            import pyarrow.dataset as ds
            for d in dirs:
                dset = ds.dataset(self.fs.join(self.path, d),
                                  format="parquet")
                tab = dset.to_table(
                    columns=["term"],
                    filter=(ds.field("term") >= prefix)
                    & (ds.field("term") < hi))
                terms.update(tab["term"].to_pylist())
                if len(terms) > cap:
                    break
        else:
            rows = (self.term_stats()
                    .filter((F.col("term") >= prefix) & (F.col("term") < hi))
                    .select("term").limit(cap + 1).collect())
            terms = {r["term"] for r in rows}
        if len(terms) > cap:
            raise ValueError(
                f"prefix {prefix!r} expands to > {cap} terms; "
                f"tighten the prefix or raise cap")
        return sorted(terms)

    def _idf_lookup(self, terms: list[str]) -> dict[str, float]:
        """term -> idf for the query terms, from term_stats (base +
        deltas). Driver-cached per Searcher (N is load-time fixed, so idf
        is too). Cold terms resolve via a pyarrow footer-pruned read on
        local indexes — a millisecond metadata lookup instead of a Spark
        job — falling back to the Spark merged view elsewhere. OOV terms
        are cached as absent (df<=0) so repeats skip the lookup too."""
        missing = [t for t in terms if t not in self._idf_cache]
        if missing:
            dirs = [self.manifest.get("ts_base", "term_stats")] \
                + self.manifest.get("ts_deltas", [])
            df_by_term: dict[str, int] = {}
            if self.fs.is_local:
                import pyarrow.dataset as ds
                for d in dirs:
                    dset = ds.dataset(self.fs.join(self.path, d),
                                      format="parquet")
                    tab = dset.to_table(
                        columns=["term", "df"],
                        filter=ds.field("term").isin(missing))
                    for t, c in zip(tab["term"].to_pylist(),
                                    tab["df"].to_pylist()):
                        df_by_term[t] = df_by_term.get(t, 0) + int(c)
            else:
                rows = (self.term_stats()
                        .filter(_in_list("term", missing))
                        .select("term", "df").collect())
                for r in rows:
                    df_by_term[r["term"]] = int(r["df"])
            for t in missing:
                d = df_by_term.get(t, 0)
                self._idf_cache[t] = (
                    float(idf_np(d, self.n_docs)) if d > 0 else float("nan"))
        out = {t: v for t in terms
               if not np.isnan(v := self._idf_cache[t])}
        return out

    def _materialize(self, df: DataFrame) -> DataFrame:
        pdf = df.toPandas()  # Arrow both ways; <= sum(k) rows by construction
        return self.spark.createDataFrame(pdf, schema=schemas.RESULTS) \
            if len(pdf) else self.spark.createDataFrame([], schemas.RESULTS)

    # -- internals -----------------------------------------------------------
    def _filter_mode(self, predicate: str) -> str:
        """allow/deny from a CACHED docs sample — never a per-batch
        full-table count (the scale-killer flagged in round 1). The mode
        only affects which side of the predicate ships to the scorer;
        results are identical either way, so sampling error is benign."""
        from pdx_spark.plans.planner import SELECTIVITY_THRESHOLD
        if self._sel_sample is None:
            frac = min(1.0, 200_000.0 / max(self.n_docs, 1))
            s = self.docs() if frac >= 1.0 else self.docs().sample(
                fraction=frac, seed=SEED)
            s = s.persist()
            self._sel_sample = (s, s.count())
        sample, n = self._sel_sample
        n_pass = sample.filter(F.expr(predicate)).count()
        self._last_sel_frac = n_pass / max(n, 1)
        return "deny" if n_pass >= SELECTIVITY_THRESHOLD * max(n, 1) else "allow"

    def _collect_small_mask(self, mask_df: DataFrame,
                            pred_mode: str | None) -> dict | None:
        """Small masks ride the scorer CLOSURE instead of the cogroup
        channel: the reference fuses selection vectors into the scan
        (searcher.hpp:284-372) rather than running a separate routing
        pass, and a selective predicate or a short tombstone list is
        exactly that case — forcing it through cogroup forfeits the
        shuffle-free map-scan and the driver-side planner. Returns
        {mode, ids sorted int64[], p int8[]} when the mask has at most
        _ROUTING_CAP rows, else None (cogroup carries it). The sample-
        based selectivity estimate skips the bounded peek when the mask
        is obviously huge, so unselective predicates pay nothing new."""
        est = None
        if pred_mode is not None and self._last_sel_frac is not None:
            frac = self._last_sel_frac if pred_mode == "allow" \
                else 1.0 - self._last_sel_frac
            est = frac * self.n_docs + self.manifest.get("tombstones", 0)
        elif pred_mode is None:
            est = self.manifest.get("tombstones", 0)
        if est is not None and est > 2 * _ROUTING_CAP:
            return None
        pdf = mask_df.select("id", "p").limit(_ROUTING_CAP + 1).toPandas()
        if len(pdf) > _ROUTING_CAP:
            return None
        ids = pdf["id"].to_numpy(np.int64)
        p = pdf["p"].to_numpy(np.int8)
        order = np.argsort(ids, kind="stable")
        return {"mode": pred_mode, "ids": ids[order], "p": p[order]}

    def _mask_df(self, predicate: str | None):
        """-> (aux-format (shard, kind=0, id, p) rows | None, mode).
        p=1 predicate-pass (allow mode), p=0 predicate-fail (deny mode)
        or tombstoned. Deny mode ships the complement when the predicate
        passes most docs — the selectivity-adaptive F3 analog (reference
        searcher.hpp:57, threshold 0.80)."""
        parts, mode = [], None
        if predicate is not None:
            mode = self._filter_mode(predicate)
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
        return df.select(
            (F.col("doc_id") / self.cfg.docs_per_shard).cast("long").alias("shard"),
            F.lit(_KIND_MASK).alias("kind"),
            F.col("doc_id").cast("long").alias("id"),
            F.col("p").cast("int").alias("p")), mode

    def _aux(self, mask_df: DataFrame | None,
             asg_df: DataFrame | None) -> DataFrame | None:
        """Union mask rows + query-routing rows into the one cogroup-side
        frame (applyInPandas cogroups exactly two frames)."""
        parts = []
        if mask_df is not None:
            parts.append(mask_df)
        if asg_df is not None:
            parts.append(asg_df.select(
                F.col("shard").cast("long").alias("shard"),
                F.lit(_KIND_QUERY).alias("kind"),
                F.col("query_id").cast("long").alias("id"),
                F.lit(0).alias("p")))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _map_scan(self, seg: DataFrame, qspec, idf: dict[str, float],
                  routing: dict[int, set] | None = None,
                  anti_routing: dict[int, set] | None = None,
                  mask: dict | None = None) -> DataFrame:
        """Shuffle-free scan: the scorer runs as mapInPandas directly on
        the parquet scan partitions (see _partition_scorer for why this
        is exact). A SMALL predicate/tombstone mask rides the scorer
        closure (`mask`, from _collect_small_mask) — the scan-fused
        selection vector; large masks go through the cogroup channel
        instead (search_batch keeps mask_df non-None in that case).
        Exactness requires the one-row-group-per-file invariant
        (_verify_scan_granularity); when it is unproven, the scan
        degrades to the always-exact cogroup channel (closure masks are
        never adopted in that state — see search_batch's gate)."""
        if not self._map_scan_ok:
            assert mask is None, "closure mask requires the map scan"
            asg_df = None
            if routing is not None:
                asg_df = self.spark.createDataFrame(
                    sorted((q, sh) for sh, qs in routing.items()
                           for q in qs), "query_id int, shard long")
                seg = seg.filter(_shard_filter(routing))
            if anti_routing is not None:
                # distributed complement: (all scanned shards x queries)
                # minus the anti pairs — never collected to the driver
                all_q = {int(q) for q, _, _, _ in qspec}
                anti_df = self.spark.createDataFrame(
                    sorted((q, int(sh)) for sh, qs in anti_routing.items()
                           for q in qs), "query_id int, shard long")
                q_df = self.spark.createDataFrame(
                    [(q,) for q in sorted(all_q)], "query_id int")
                asg_df = (seg.select("shard").distinct()
                          .crossJoin(F.broadcast(q_df))
                          .join(anti_df, ["query_id", "shard"], "left_anti"))
            return self._scan(seg, qspec, idf, None, None, asg_df=asg_df)
        payload = {"queries": qspec, "idf": idf,
                   "avgdl": self.avgdl, "k1": self.params.k1,
                   "b": self.params.b,
                   "docs_per_shard": self.cfg.docs_per_shard,
                   "predicate_mode": None if mask is None else mask["mode"],
                   "assigned": False, "has_mask": mask is not None,
                   "mask": mask,
                   "routing": routing, "anti_routing": anti_routing,
                   "require_all": bool(getattr(self, "_require_all", False)),
                   "min_match": int(getattr(self, "_min_match", 1))}
        fn = _partition_scorer(payload, arrow=_ARROW_SCAN)
        if routing is not None:
            # routed scans touch few shards; every python task costs a
            # fixed ~0.2-0.3 CPU-s (Arrow runner round-trip) REGARDLESS
            # of data, so a 2-shard seed scan split across 32 scan
            # partitions pays 32x overhead for nothing. Coalesce to at
            # most one task per routed shard, and to at most one task
            # per _ROUTED_TASK_BYTES of the routed byte slice (no
            # shuffle — scan partitions merge). Unrouted/exhaustive
            # scans keep full scan parallelism.
            seg = seg.coalesce(self._routed_task_count(len(routing)))
        if _ARROW_SCAN:
            return seg.mapInArrow(fn, schema=schemas.RESULTS)
        return seg.mapInPandas(fn, schema=schemas.RESULTS)

    def _scan(self, seg: DataFrame, qspec, idf: dict[str, float],
              mask_df: DataFrame | None, predicate_mode: str | None,
              asg_df: DataFrame | None = None) -> DataFrame:
        payload = {"queries": qspec, "idf": idf,
                   "avgdl": self.avgdl, "k1": self.params.k1,
                   "b": self.params.b,
                   "docs_per_shard": self.cfg.docs_per_shard,
                   "predicate_mode": predicate_mode,
                   "assigned": asg_df is not None,
                   "has_mask": mask_df is not None,
                   "require_all": bool(getattr(self, "_require_all", False)),
                   "min_match": int(getattr(self, "_min_match", 1))}
        aux = self._aux(mask_df, asg_df)
        if aux is not None:
            fn = _shard_scorer(payload, has_aux=True)
            return (seg.groupBy("shard")
                    .cogroup(aux.groupBy("shard"))
                    .applyInPandas(fn, schema=schemas.RESULTS))
        fn = _shard_scorer(payload, has_aux=False)
        return seg.groupBy("shard").applyInPandas(fn, schema=schemas.RESULTS)

    def _merge_bound_ok(self, live) -> bool:
        """May the global top-k merge run driver-side? The map-scan
        scorer emits at most Σk rows per SCAN PARTITION (per-partition
        per-query top-k), so the collect is bounded by
        n_segment_files x Σk rows (coalesced scans only shrink it).
        Driver work stays bounded-with-distributed-fallback: above the
        cap (or when the file count is unknown) the window merge runs
        Spark-side, unchanged."""
        n_files = self._segment_file_count()
        if n_files <= 0:
            return False
        sum_k = sum(k for _, _, k in live)
        return n_files * sum_k <= _MERGE_LOCAL_CAP

    @staticmethod
    def _topk_merge_pdf(pdfs: list[pd.DataFrame], live) -> pd.DataFrame:
        """numpy global top-k merge of per-partition top-k frames: sort
        by (query, score desc, doc asc) — the exact window order of
        _global_topk — and keep each query's first k rows. Same
        tie-break, same rows; only WHERE the merge runs differs."""
        pdf = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs,
                                                       ignore_index=True)
        if not len(pdf):
            return pdf
        q = pdf["query_id"].to_numpy()
        d = pdf["doc_id"].to_numpy()
        s = pdf["score"].to_numpy()
        order = np.lexsort((d, -s, q))
        q, d, s = q[order], d[order], s[order]
        kmap = {int(qq): int(k) for qq, _, k in live}
        keep = np.zeros(len(q), dtype=bool)
        starts = np.concatenate(
            [[0], np.nonzero(q[1:] != q[:-1])[0] + 1, [len(q)]])
        for i in range(len(starts) - 1):
            a, b = int(starts[i]), int(starts[i + 1])
            keep[a:min(b, a + kmap.get(int(q[a]), 0))] = True
        return pd.DataFrame({
            "query_id": pd.Series(q[keep], dtype="int32"),
            "doc_id": pd.Series(d[keep], dtype="int64"),
            "score": pd.Series(s[keep], dtype="float64")})

    def _merge_topk_local(self, res: DataFrame, live,
                          extra_pdf: pd.DataFrame | None = None
                          ) -> DataFrame:
        """Collect the bounded per-partition top-k and merge driver-side
        (one collect stage — no exchange, no window, and the returned
        frame is local so downstream count()/collect() are free).
        Callers must have checked _merge_bound_ok."""
        parts = [res.toPandas()]
        if extra_pdf is not None and len(extra_pdf):
            parts.append(extra_pdf)
        merged = self._topk_merge_pdf(parts, live)
        if not len(merged):
            return self.spark.createDataFrame([], schemas.RESULTS)
        return self.spark.createDataFrame(merged, schema=schemas.RESULTS)

    def _global_topk(self, res: DataFrame, live) -> DataFrame:
        kdf = _pdf_df(self.spark, {
            "query_id": pd.Series([q for q, _, _ in live], dtype="int32"),
            "k": pd.Series([k for _, _, k in live], dtype="int32")},
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
