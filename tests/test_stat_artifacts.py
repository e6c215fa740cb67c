"""Driver-side stat-artifact writer (indexer.stat_artifacts_local):
values must equal the distributed derivation — df = Σ block n per
term, bounds = min/max over blocks, ceil/floor u8 quantization — and
edge cases (empty input, cap exceeded) must behave. Pure
pyarrow/pandas, no Spark session."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdx_spark.fs import LocalFS
from pdx_spark.functions.quantize import dequantize_np
from pdx_spark.operators.indexer import stat_artifacts_local


def _seg_file(path, rows):
    cols = {k: [r[k] for r in rows]
            for k in ("term", "shard", "n", "max_tf", "min_dl", "gmax")}
    pq.write_table(pa.table({
        "term": pa.array(cols["term"], pa.string()),
        "shard": pa.array(cols["shard"], pa.int64()),
        "n": pa.array(cols["n"], pa.int32()),
        "max_tf": pa.array(cols["max_tf"], pa.int32()),
        "min_dl": pa.array(cols["min_dl"], pa.int32()),
        "gmax": pa.array(cols["gmax"], pa.float64())}), path)


def test_stat_artifacts_local_values(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    _seg_file(str(seg / "a.parquet"), [
        dict(term="x", shard=0, n=3, max_tf=5, min_dl=10, gmax=1.5),
        dict(term="x", shard=0, n=2, max_tf=9, min_dl=4, gmax=2.5),
        dict(term="y", shard=1, n=7, max_tf=1, min_dl=40, gmax=0.5)])
    _seg_file(str(seg / "b.parquet"), [
        dict(term="x", shard=1, n=1, max_tf=2, min_dl=30, gmax=0.25)])
    ts, dd = str(tmp_path / "ts"), str(tmp_path / "dir")
    params = stat_artifacts_local(LocalFS(), [str(seg)], ts, dd)
    assert params is not None

    t = pq.read_table(ts).to_pydict()
    assert t["term"] == ["x", "y"]
    assert t["df"] == [6, 7]          # sum of block n per term
    assert t["max_tf"] == [9, 1]
    assert t["gmax"] == [2.5, 0.5]

    d = pq.read_table(dd).to_pydict()
    assert list(zip(d["term"], d["shard"])) == [("x", 0), ("x", 1),
                                                ("y", 1)]
    assert d["n_blocks"] == [2, 1, 1]
    assert d["n_postings"] == [5, 1, 7]
    # dequantized bounds stay admissible: >= true max_tf, <= true min_dl
    up = dequantize_np(np.array(d["max_tf_q"]), params["tf_base"],
                       params["tf_scale"])
    dn = dequantize_np(np.array(d["min_dl_q"]), params["dl_base"],
                       params["dl_scale"])
    assert (up >= np.array([9, 2, 1]) - 1e-9).all()
    assert (dn <= np.array([4, 30, 40]) + 1e-9).all()


def test_stat_artifacts_local_empty_and_cap(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    ts, dd = str(tmp_path / "ts"), str(tmp_path / "dir")
    params = stat_artifacts_local(LocalFS(), [str(seg)], ts, dd)
    assert params == {"tf_base": 0.0, "tf_scale": 0.0,
                      "dl_base": 0.0, "dl_scale": 0.0}
    assert pq.read_table(ts).num_rows == 0
    assert pq.read_table(dd).num_rows == 0

    _seg_file(str(seg / "a.parquet"),
              [dict(term="x", shard=0, n=1, max_tf=1, min_dl=1, gmax=1.0)])
    assert stat_artifacts_local(LocalFS(), [str(seg)], ts, dd,
                                cap_rows=0) is None  # cap -> fallback
