"""Text-analysis function tests vs hand-computed values."""

import math

import pytest
from pyspark.sql import functions as F

from pdx_spark.functions import textstats as X
from pdx_spark.functions.tokenize import tokenize_py

ROWS = [
    (0, "The quick brown fox and the lazy dog in a field."),
    (1, "der die das und ist nicht ein"),
    (2, "!!! ??? ..."),
    (3, ""),
    (4, None),
    (5, "le la les de et un une est"),
    (6, "word " * 100),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def _vals(df, col):
    return {r["id"]: r["v"] for r in
            df.select("id", col.alias("v")).collect()}


def test_token_counts(df):
    ws = _vals(df, X.ws_token_count(F.col("text")))
    re_ = _vals(df, X.regex_token_count(F.col("text")))
    assert ws[0] == 11 and re_[0] == 11
    assert ws[2] == 3 and re_[2] == 0     # punct-only: ws sees 3 "words"
    assert ws[3] == 0 and re_[3] == 0
    assert ws[4] == 0 and re_[4] == 0
    assert re_[6] == 100


def test_punct_ratio(df):
    pr = _vals(df, X.punct_ratio(F.col("text")))
    assert pr[3] == 0.0 and pr[4] == 0.0
    text0 = ROWS[0][1]
    expected = sum(1 for c in text0 if not (c.isalnum() or c == " ")) / len(text0)
    assert math.isclose(pr[0], expected, rel_tol=1e-9)
    assert pr[2] > 0.5


def test_stopword_ratio_and_lang(df):
    sw = _vals(df, X.stopword_ratio(F.col("text")))
    toks = tokenize_py(ROWS[0][1])
    want = sum(1 for t in toks if t in X.STOPWORDS["en"]) / len(toks)
    assert math.isclose(sw[0], want, rel_tol=1e-9)
    lg = _vals(df, X.lang_guess(F.col("text")))
    assert lg[0] == "en" and lg[1] == "de" and lg[5] == "fr"
    assert lg[2] == "und" and lg[3] == "und"


def test_fingerprint_properties(df, spark):
    fp = _vals(df, X.fingerprint(F.col("text")))
    assert fp[3] == 0 and fp[4] == 0          # empty -> 0
    assert 0 <= fp[0] < X.FP_MOD
    # order sensitivity: same bag, different order -> different fp
    d2 = spark.createDataFrame([(0, "alpha beta gamma"), (1, "gamma beta alpha"),
                                (2, "Alpha, beta?? GAMMA")],
                               "id long, text string")
    v = _vals(d2, X.fingerprint(F.col("text")))
    assert v[0] != v[1]
    assert v[0] == v[2]  # robust to case/punct/whitespace

    # python mirror of the rolling hash
    import hashlib
    def md5long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    acc = 0
    for t in ["alpha", "beta", "gamma"]:
        acc = (acc * X.FP_MULT + md5long(t) % X.FP_MOD) % X.FP_MOD
    assert v[0] == acc


def test_quality_score_bounds(df):
    q = _vals(df, X.quality_score(F.col("text")))
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[0] > q[2]  # prose beats punctuation soup
