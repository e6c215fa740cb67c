"""Source adapter seam: one reader shape for parquet/table/iceberg
(BASELINE.json input_hint names an Iceberg transcripts table; the
container has no Iceberg runtime, so that branch is gated with a clear
error while parquet/table paths are fully exercised)."""

import pytest

from pdx_spark.schemas import TRANSCRIPTS
from pdx_spark.sources.fixtures import make_transcripts_pdf
from pdx_spark.sources.transcripts import (incremental_transcripts,
                                           read_transcripts)

COLS = [f.name for f in TRANSCRIPTS.fields]


def test_parquet_source(spark, tmp_path):
    pdf = make_transcripts_pdf(10)
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(pdf, schema=TRANSCRIPTS).write.parquet(p)
    df = read_transcripts(spark, p)
    assert df.columns == COLS
    assert df.count() == len(pdf)


def test_table_source(spark, tmp_path):
    pdf = make_transcripts_pdf(5)
    spark.createDataFrame(pdf, schema=TRANSCRIPTS) \
        .createOrReplaceTempView("transcripts_view")
    df = read_transcripts(spark, "table:transcripts_view")
    assert df.columns == COLS and df.count() == len(pdf)


def test_iceberg_source_gated(spark):
    with pytest.raises(RuntimeError, match="Iceberg"):
        read_transcripts(spark, "iceberg:cat.db.transcripts")
    with pytest.raises(ValueError):
        incremental_transcripts(spark, "/some/path", from_snapshot_id=1)
