"""Text-analysis functions for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure JVM Column expressions (whole-stage codegen) so
they run at scan speed; each has a matching ANSI-SQL form for the DuckDB
oracle (kept in __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdx_spark.functions.tokenize import tokens_col

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
}

FP_MOD = 1_000_000_007  # fingerprint modulus (fits 31*p+h in int64)
FP_MULT = 31


def ws_token_count(col):
    """Whitespace token count (split on runs of whitespace)."""
    arr = F.split(F.trim(F.coalesce(col, F.lit(""))), r"\s+")
    return F.size(F.filter(arr, lambda x: x != F.lit("")))


def regex_token_count(col):
    """BPE-ish regex token count = [a-z0-9]+ runs after lowercasing."""
    return F.size(tokens_col(col))


def punct_ratio(col):
    """Non-alphanumeric-non-space chars / total chars (0 for empty)."""
    s = F.coalesce(col, F.lit(""))
    n = F.length(s)
    punct = n - F.length(F.regexp_replace(s, "[^a-zA-Z0-9 ]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col, lang: str = "en"):
    toks = tokens_col(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col):
    """Composite [0,1] quality heuristic: length band + low punctuation +
    plausible stopword ratio. Deterministic, explainable, cheap."""
    n_tok = regex_token_count(col).cast("double")
    len_component = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_component = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.4)) * 2, F.lit(1.0))
    return F.round((len_component + punct_component + sw_component) / 3.0, 6)


def lang_guess(col):
    """Stopword-vote language ID over a small language set; 'und' if no
    stopword hits. (n-gram heuristic class of detector; deterministic.)"""
    toks = tokens_col(col)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))))
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # deterministic priority: later wins only with strictly higher score,
    # so iterate reversed alphabetical and pick first max by 'when' chain
    for lang, s in scores:
        guess = F.when((s == best_score) & (best_score > 0) & (guess == "und"),
                       F.lit(lang)).otherwise(guess)
    return guess


def md5_long(col):
    """Deterministic 60-bit integer from md5 — the cross-engine hash used
    by fingerprints/minhash (same value computable in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def fingerprint(col):
    """Rolling polynomial hash over the ordered token sequence:
    fp = fold(tokens, 0, (acc, t) -> (acc*31 + md5_long(t) % M) % M).
    Order-sensitive (unlike a bag-of-words hash) — detects exact token
    sequences regardless of whitespace/punctuation differences."""
    toks = tokens_col(col)
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MULT + md5_long(t) % FP_MOD) % FP_MOD)
