"""Deduplication operators for training-data pipelines, over any
DataFrame with (doc_id: long, text: string):

  exact          — md5 hash-groupBy duplicate groups
  ngram_jaccard  — word-n-gram shingle Jaccard >= threshold pairs
  minhash_lsh    — MinHash signatures + banded LSH candidate pairs
  simhash        — 63-bit SimHash + hamming-distance near-dup pairs

All hashes are md5-derived (md5_long) so every step is reproducible in
ANSI SQL for the DuckDB oracle — no engine-private hash functions.
Design for scale: every operator is shuffle-on-a-bounded-key (hash,
shingle, band bucket, simhash band); no O(n^2) all-pairs join ever —
candidate generation via equi-join on bucket keys, verification only on
candidates. Hot buckets (boilerplate shingles) are frequency-capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdx_spark.functions.textstats import md5_long
from pdx_spark.functions.tokenize import tokens_col

MERSENNE = (1 << 61) - 1


def normalized_text_col(col):
    """Canonical text form for normalization-tolerant exact dedup:
    lowercase, collapse whitespace runs, strip. Pure JVM expression;
    SQL twin: trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     normalize: bool = False,
                     max_doc_ids: int | None = None) -> DataFrame:
    """-> (text_md5, n_dups, canonical_doc_id, doc_ids sorted): groups of
    byte-identical (or, with normalize=True, case/whitespace-insensitive)
    texts (size >= 2). One shuffle on the hash.

    max_doc_ids bounds the per-group doc_ids array (smallest ids kept):
    at 100 TB a boilerplate corpus has hash groups with 1e8 members
    (empty strings, templated docs) and an unbounded collect_list
    materializes the whole array in one reducer row. With the cap the
    listing goes through a row_number window (streaming sort, spillable)
    and collect_list only sees rows under the cap; n_dups and
    canonical_doc_id stay exact. None = full arrays (oracle parity on
    small data)."""
    base = F.coalesce(F.col(text_col), F.lit(""))
    if normalize:
        base = normalized_text_col(base)
    h = F.md5(base)
    ids = df.select(F.col("doc_id"), h.alias("text_md5"))
    if max_doc_ids is None:
        listed = F.collect_list("doc_id")
    else:
        w = Window.partitionBy("text_md5").orderBy("doc_id")
        ids = ids.withColumn("rn", F.row_number().over(w))
        listed = F.collect_list(
            F.when(F.col("rn") <= max_doc_ids, F.col("doc_id")))
    return (ids.groupBy("text_md5")
            .agg(F.count("*").cast("long").alias("n_dups"),
                 F.min("doc_id").alias("canonical_doc_id"),
                 F.array_sort(listed).alias("doc_ids"))
            .filter(F.col("n_dups") >= 2))


def dedup_drop_list(pairs: DataFrame, id_a: str = "doc_a",
                    id_b: str = "doc_b") -> DataFrame:
    """Resolution step for any near-dup PAIRS frame (minhash / simhash /
    jaccard / embedding): keep each pair's smaller id, drop the larger —
    the standard greedy canonicalization a filtering pipeline feeds its
    anti-join. pairs are emitted with id_a < id_b by construction, so the
    drop set is simply the distinct right side. -> (drop_id). Guarantees:
    every duplicate pair loses >= 1 member; the globally smallest id of
    every connected component is never dropped."""
    return (pairs.select(F.col(id_b).alias("drop_id")).distinct())


def shingles_df(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """-> (doc_id, shingle_hash): distinct hashed word-n-gram shingles.
    Docs shorter than n tokens contribute their whole token string as a
    single shingle so they can still match exact twins."""
    toks = tokens_col(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return (df.select("doc_id", F.explode(sh).alias("shingle"))
            .filter(F.col("shingle") != "")
            .select("doc_id", md5_long(F.col("shingle")).alias("shingle_hash"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text",
                        max_shingle_df: int | None = None) -> DataFrame:
    """-> (doc_a, doc_b, jaccard) for pairs with Jaccard(shingles) >=
    threshold, doc_a < doc_b. Candidate pairs come from an equi-join on
    shingle_hash (never all-pairs); max_shingle_df caps boilerplate
    shingles that would explode the join (scale guard; None = off for
    oracle parity on small data).

    The shingle frame feeds three plan arms (sizes, both join sides);
    Spark does not recognize the aliased subtrees as one exchange, so
    without a persist the tokenize+shingle+distinct pipeline (and its
    shuffle) executes once PER ARM — measured 16 source scans in the
    physical plan at the bench fixture. persist() computes it once;
    MEMORY_AND_DISK spills at scale (rows are (id, hash) — bounded,
    index-shaped, never raw text)."""
    sh = shingles_df(df, n, text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    cand_src = sh
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle_hash").count()
               .filter(F.col("count") > max_shingle_df).select("shingle_hash"))
        cand_src = sh.join(hot, "shingle_hash", "left_anti")
    a = cand_src.select(F.col("doc_id").alias("doc_a"), "shingle_hash")
    b = cand_src.select(F.col("doc_id").alias("doc_b"), "shingle_hash")
    common = (a.join(b, "shingle_hash")
              .filter(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common")))
    return (common
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                       .withColumnRenamed("sz", "sz_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                       .withColumnRenamed("sz", "sz_b"), "doc_b")
            .withColumn("jaccard", F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash function — small fixed primes scheme;
    reproducible verbatim in SQL."""
    return [(2 * i + 3, 7 * i + 1) for i in range(num_hashes)]


def minhash_signatures(df: DataFrame, n: int = 3, num_hashes: int = 16,
                       text_col: str = "text") -> DataFrame:
    """-> (doc_id, sig: array<long>): sig[i] = min over shingles of
    (a_i*(h mod P) + b_i) mod P, P = 1e9+7. The pre-mod keeps a_i*h
    inside int64 in EVERY engine (DuckDB raises on overflow where the
    JVM silently wraps — cross-engine reproducibility requires staying
    in range, not relying on wrap semantics)."""
    from pdx_spark.functions.textstats import FP_MOD
    sh = shingles_df(df, n, text_col)
    h = F.col("shingle_hash") % FP_MOD
    mins = [F.min((F.lit(a) * h + F.lit(b)) % FP_MOD).alias(f"m{i}")
            for i, (a, b) in enumerate(_minhash_params(num_hashes))]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id",
                      F.array(*[F.col(f"m{i}") for i in range(num_hashes)])
                      .alias("sig"))


def minhash_signatures_from_shingles(sh: DataFrame,
                                     num_hashes: int = 16) -> DataFrame:
    """minhash_signatures over a precomputed (doc_id, shingle_hash)
    frame — lets callers share one cached shingle pipeline between
    signature generation and Jaccard verification."""
    from pdx_spark.functions.textstats import FP_MOD
    h = F.col("shingle_hash") % FP_MOD
    mins = [F.min((F.lit(a) * h + F.lit(b)) % FP_MOD).alias(f"m{i}")
            for i, (a, b) in enumerate(_minhash_params(num_hashes))]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id",
                      F.array(*[F.col(f"m{i}") for i in range(num_hashes)])
                      .alias("sig"))


def minhash_lsh_pairs(df: DataFrame, n: int = 3, num_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.5,
                      text_col: str = "text") -> DataFrame:
    """MinHash + banded LSH: docs sharing any band bucket become candidate
    pairs; candidates verified with exact shingle Jaccard >= threshold.
    -> (doc_a, doc_b, jaccard). Shuffle keys are band buckets (bounded),
    so Zipf-duplicated boilerplate cannot serialize one reducer.

    The signature frame feeds both bucket join sides and the shingle
    frame feeds signatures + verification + sizes — persist both so the
    shingle pipeline runs once instead of once per plan arm (same
    rationale as ngram_jaccard_pairs)."""
    rows_per_band = num_hashes // bands
    sh_all = shingles_df(df, n, text_col).persist()
    sig = minhash_signatures_from_shingles(sh_all, num_hashes)
    band_cols = []
    for bi in range(bands):
        chunk = F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
        band_cols.append(F.struct(F.lit(bi).alias("band"),
                                  F.md5(F.array_join(F.transform(
                                      chunk, lambda x: x.cast("string")), "_"))
                                  .alias("bucket")))
    buckets = (sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb"))
               .select("doc_id", "bb.band", "bb.bucket"))
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    # verify candidates with exact Jaccard (reusing the cached shingles)
    sh = sh_all
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle_hash")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle_hash")
    common = (cand.join(a_sh, "doc_a").join(b_sh, ["doc_b", "shingle_hash"])
              .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common")))
    return (common
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                       .withColumnRenamed("sz", "sz_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                       .withColumnRenamed("sz", "sz_b"), "doc_b")
            .withColumn("jaccard", F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash63(df: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (doc_id, simhash: long): 63-bit SimHash over tf-weighted token
    md5 hashes (bit 63 left clear to stay in signed int64). JVM-only
    expression: 63 conditional sums over the exploded token frame."""
    toks = (df.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok"))
            .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
            .withColumn("h", md5_long(F.col("tok"))))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{i}")
        for i in range(63)]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(63):
        term = F.when(F.col(f"b{i}") > 0,
                      F.lit(1).cast("long") * F.lit(2 ** i).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3,
                           text_col: str = "text",
                           max_band_df: int | None = None) -> DataFrame:
    """Candidate pairs via 16-bit band buckets of the simhash (pigeonhole:
    hamming<=3 over 4 bands guarantees one identical band), verified by
    exact popcount of xor. -> (doc_a, doc_b, hamming).

    max_band_df caps hot band buckets (scale guard, mirrors
    ngram_jaccard_pairs' max_shingle_df): the band self-join is quadratic
    within a bucket, and near-empty/templated docs concentrate in one
    simhash band value, reviving the all-pairs blowup banding exists to
    avoid. Buckets with more than max_band_df members are dropped from
    candidate generation — this CAN drop true near-dup pairs whose only
    shared band is a capped one (document downstream; exact twins are
    better handled by exact_dup_groups first). None = off (oracle parity
    on small data)."""
    # sim feeds both band-join sides: persist so the tokenize + 63-bit
    # aggregation runs once (one slim row per doc)
    sim = simhash63(df, text_col).persist()
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 (F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(0xFFFF))
                 .alias("bk"))
        for i in range(4)])
    buckets = (sim.select("doc_id", "simhash", F.explode(band_arr).alias("bb"))
               .select("doc_id", "simhash", "bb.band", "bb.bk"))
    if max_band_df is not None:
        hot = (buckets.groupBy("band", "bk").count()
               .filter(F.col("count") > max_band_df).select("band", "bk"))
        buckets = buckets.join(hot, ["band", "bk"], "left_anti")
    a = buckets.select(F.col("doc_id").alias("doc_a"),
                       F.col("simhash").alias("sim_a"), "band", "bk")
    b = buckets.select(F.col("doc_id").alias("doc_b"),
                       F.col("simhash").alias("sim_b"), "band", "bk")
    cand = (a.join(b, ["band", "bk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sim_a", "sim_b").distinct())
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs with cosine >= threshold. Exact but
    all-pairs (use for verification / small partitions); the scalable
    candidate path is similarity.lsh_cosine_pairs."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                   norm.alias("nrm")).filter(F.col("nrm") > 0).persist()
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
