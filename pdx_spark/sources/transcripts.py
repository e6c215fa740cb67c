"""Transcript source adapter — the input seam for the corpus the index
builds over (BASELINE.json input_hint: an Iceberg table of multi-turn
transcripts with columns (conv_id, turn_idx, role, text, tool, ts)).

`read_transcripts` dispatches on a source string:

  "iceberg:<catalog.db.table>"  -> spark.read.format("iceberg"), with
      snapshot/as-of options passed through. Iceberg gives the build
      what a raw parquet dir cannot: snapshot isolation (a build pins
      one snapshot id and is reproducible), hidden-partition pruning,
      and incremental scans (appends-between-snapshots feed
      Maintainer.append). The sandbox container ships no Iceberg
      runtime jar (and no network to fetch one), so against a bare
      session this branch raises a clear error. The branch itself IS
      executed in tests against a Python DSv2 stand-in registered
      under the same "iceberg" short name implementing the same
      reader options (tests/test_iceberg_standin.py: snapshot-pinned
      read -> build -> incremental scan -> append, end to end); with
      the real runtime jar on the classpath (README "Iceberg" recipe)
      the identical code runs against a real catalog.
  "table:<name>"                -> spark.table (any catalog-registered
      source: Iceberg, Delta, Hive — whatever the session catalog has).
  anything else                 -> parquet path(s) with the declared
      TRANSCRIPTS schema (the sandbox/test path).

Every branch returns the same shape: a DataFrame with exactly the
TRANSCRIPTS columns, so Indexer/Maintainer are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pdx_spark.schemas import TRANSCRIPTS

_COLS = [f.name for f in TRANSCRIPTS.fields]


def read_transcripts(spark, source: str, *, snapshot_id: int | None = None,
                     as_of_timestamp: int | None = None) -> DataFrame:
    """-> DataFrame(conv_id, turn_idx, role, text, tool, ts)."""
    if source.startswith("iceberg:"):
        name = source[len("iceberg:"):]
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        try:
            df = reader.load(name)
        except Exception as e:  # no Iceberg runtime in this container
            raise RuntimeError(
                "Iceberg source requested but no Iceberg runtime is "
                "available in this Spark session (add the "
                "iceberg-spark-runtime jar and a catalog config); "
                f"source={name!r}") from e
        return df.select(*_COLS)
    if source.startswith("table:"):
        return spark.table(source[len("table:"):]).select(*_COLS)
    return spark.read.schema(TRANSCRIPTS).parquet(source).select(*_COLS)


def incremental_transcripts(spark, source: str, *, from_snapshot_id: int,
                            to_snapshot_id: int | None = None) -> DataFrame:
    """Appended rows between two Iceberg snapshots — the natural feed for
    Maintainer.append / the streaming ingest twin. Iceberg-only by
    definition (parquet dirs have no snapshot lineage)."""
    if not source.startswith("iceberg:"):
        raise ValueError("incremental scans need an iceberg: source")
    name = source[len("iceberg:"):]
    reader = (spark.read.format("iceberg")
              .option("start-snapshot-id", str(from_snapshot_id)))
    if to_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(to_snapshot_id))
    try:
        return reader.load(name).select(*_COLS)
    except Exception as e:
        raise RuntimeError(
            "Iceberg incremental scan unavailable in this session; "
            f"source={name!r}") from e
