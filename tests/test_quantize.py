"""Quantizer tests (reference scalar.hpp round-trip semantics)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdx_spark.functions.quantize import (compute_params, dequantize_np,
                                          quantize_col, quantize_np,
                                          quantize_sql, quantize_up_np)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(42)
    x = rng.uniform(-5, 17, size=1000)
    base, scale = x.min(), 255.0 / (x.max() - x.min())
    q = quantize_np(x, base, scale)
    back = dequantize_np(q, base, scale)
    assert np.abs(back - x).max() <= 0.5 / scale + 1e-12


def test_upper_bound_variant_is_admissible():
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 3, size=500)
    base, scale = 0.0, 255.0 / 3.0
    qu = quantize_up_np(x, base, scale)
    back = dequantize_np(qu, base, scale)
    assert (back >= x - 1e-12).all()   # never under-estimates a bound


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=50))
def test_quantize_in_range(xs):
    x = np.array(xs)
    lo, hi = x.min(), x.max()
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    q = quantize_np(x, lo, scale)
    assert q.min() >= 0 and q.max() <= 255


def test_spark_matches_numpy_and_sql(spark):
    import duckdb
    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 9, size=300)
    df = spark.createDataFrame([(int(i), float(v)) for i, v in enumerate(x)],
                               "id long, v double")
    base, scale = compute_params(df, "v")
    got = {r["id"]: r["q"] for r in
           df.select("id", quantize_col(F.col("v"), base, scale).alias("q"))
           .collect()}
    want = quantize_np(x, base, scale)
    assert all(got[i] == int(want[i]) for i in range(len(x)))
    sql_vals = duckdb.sql(
        "SELECT " + quantize_sql("v", base, scale) +
        " AS q FROM (SELECT unnest(?::DOUBLE[]) AS v)",
        params=[list(map(float, x))]).fetchall()
    assert [int(r[0]) for r in sql_vals] == [int(v) for v in want]


def test_column_quantize_bounds_admissible(spark):
    """Ceil/floor Column variants: dequant(quant_up(x)) >= x and
    dequant(quant_down(x)) <= x for every value in range — the property
    that keeps u8 directory bounds exact for pruning."""
    import pyspark.sql.functions as F

    from pdx_spark.functions.quantize import (dequantize_col,
                                              quantize_down_col,
                                              quantize_up_col)
    vals = list(range(1, 300, 7)) + [1, 299]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    lo, hi = float(min(vals)), float(max(vals))
    scale = 255.0 / (hi - lo)
    out = df.select(
        "x",
        dequantize_col(quantize_up_col(F.col("x"), lo, scale), lo, scale)
        .alias("up"),
        dequantize_col(quantize_down_col(F.col("x"), lo, scale), lo, scale)
        .alias("dn")).collect()
    for r in out:
        assert r["up"] >= r["x"] - 1e-9, (r["x"], r["up"])
        assert r["dn"] <= r["x"] + 1e-9, (r["x"], r["dn"])
    # flat range: scale 0 round-trips to base exactly
    flat = spark.createDataFrame([(5,)], "x int").select(
        dequantize_col(quantize_up_col(F.col("x"), 5.0, 0.0), 5.0, 0.0)
        .alias("v")).collect()[0]["v"]
    assert flat == 5.0
