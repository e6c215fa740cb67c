"""Tokenizer parity: JVM built-in path == Arrow UDF path == Python oracle
path (the three must never drift — they are the B2/B3 analogs)."""

from pyspark.sql import functions as F

from pdx_spark.functions.tokenize import (tokenize_map_in_arrow, tokenize_py,
                                          with_tokens)

CASES = [
    "Hello, World!",
    "  leading and trailing  ",
    "MiXeD CaSe 123abc 456",
    "punct;only!!! ??? ...",
    "",
    None,
    "unicode départ naïve",  # non-ascii letters split tokens
    "a",
    "x" * 5000,
]


def test_python_tokenizer():
    assert tokenize_py("Hello, World!") == ["hello", "world"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("a1b2-c3") == ["a1b2", "c3"]


def test_jvm_equals_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "id int, text string")
    rows = with_tokens(df).orderBy("id").collect()
    for r in rows:
        assert r["tokens"] == tokenize_py(CASES[r["id"]]), CASES[r["id"]]


def test_arrow_equals_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "id int, text string")
    rows = tokenize_map_in_arrow(df).orderBy("id").collect()
    for r in rows:
        assert r["tokens"] == tokenize_py(CASES[r["id"]]), CASES[r["id"]]


def test_fixture_corpus_parity(spark, tiny_df):
    jvm = with_tokens(tiny_df).select("conv_id", "turn_idx", "tokens")
    arrow = tokenize_map_in_arrow(tiny_df).select("conv_id", "turn_idx", "tokens")
    diff = jvm.exceptAll(arrow)
    assert diff.count() == 0


def test_doc_postings_equals_python(spark):
    """doc_postings' Arrow-native body (utf8_lower + RE2 split +
    dictionary ranks) must produce exactly sorted(Counter(tokenize_py))
    per doc — including the U+0130 SpecialCasing edge ('İ' lowers to
    'i' + combining dot in Python/JVM, splitting the token) and random
    unicode near the ascii/caseful boundary."""
    import random
    from collections import Counter

    from pdx_spark.operators.corpus import doc_postings

    rng = random.Random(42)
    alphabet = "aA1zZ9!İKßẞ Ωσé-_.̇K"
    cases = list(CASES) + ["İstanbul İİ K(kelvin)", "İ1", "ßẞss"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string")
    rows = doc_postings(df).orderBy("doc_id").collect()
    assert len(rows) == len(cases)
    for r in rows:
        toks = tokenize_py(cases[r["doc_id"]])
        want = sorted(Counter(toks).items())
        got = list(zip(r["terms"], r["tfs"]))
        assert got == want, (cases[r["doc_id"]], got, want)
        assert r["dl"] == len(toks)
