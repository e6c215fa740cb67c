"""Tokenization — the analog of the reference's query/data preprocessing
(NormalizeAndRotate, /root/reference/include/pdx/index.hpp:75-99): a
deterministic, corpus-independent transform applied identically on the
build side and the query side.

Two interchangeable implementations, tested equal:

* ``tokens_col`` — pure JVM built-ins (lower + regex split), stays inside
  WholeStageCodegen; the default/hot path.
* ``tokenize_map_in_arrow`` — vectorized Arrow batch UDF (mapInPandas),
  the north-star-mandated form; useful template when tokenization grows
  beyond what regex built-ins express.

Both implement: lowercase, extract runs of [a-z0-9].
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdx_spark.config import TOKEN_PATTERN, TOKEN_SPLIT_PATTERN

_RX = re.compile(TOKEN_PATTERN)


def tokenize_py(text: str | None) -> list[str]:
    """Single-string tokenizer — used by the Python oracle and on the
    driver for query strings. MUST stay semantically identical to
    tokens_col()."""
    if not text:
        return []
    return _RX.findall(text.lower())


def tokens_col(col) -> "F.Column":
    """JVM-side tokens array: split on non-[a-z0-9] runs, drop empties.
    Codegen-friendly; equals re.findall(TOKEN_PATTERN, lower(text))."""
    arr = F.split(F.lower(F.coalesce(col, F.lit(""))), TOKEN_SPLIT_PATTERN)
    return F.filter(arr, lambda x: x != F.lit(""))


def with_tokens(df: DataFrame, text_col: str = "text",
                out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, tokens_col(F.col(text_col)))


def tokenize_map_in_arrow(df: DataFrame, text_col: str = "text",
                          out_col: str = "tokens") -> DataFrame:
    """Arrow-vectorized tokenizer over mapInPandas (no per-row Python on
    the Spark side; pandas .str ops run the regex in a tight C loop over
    each Arrow batch)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(df.schema.fields +
                              [T.StructField(out_col, T.ArrayType(T.StringType()))])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf[text_col].fillna("")
            pdf = pdf.copy()
            pdf[out_col] = s.str.lower().str.findall(TOKEN_PATTERN)
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)
