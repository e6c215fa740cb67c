"""A Python DSv2 stand-in for the Iceberg Spark connector.

The sandbox (and many CI boxes) ships no `iceberg-spark-runtime` jar
and no network to fetch one, which would leave the `iceberg:` branch of
`sources/transcripts.py` untestable. This module registers a Python
Data Source (PySpark 4 DSv2 API) under the SAME short name the real
connector uses — ``iceberg`` — implementing the same reader options the
seam passes through:

  snapshot-id           pin one snapshot (reproducible builds)
  as-of-timestamp       time travel
  start-snapshot-id /   incremental scan: rows appended between two
  end-snapshot-id       snapshots (feeds Maintainer.append)

It serves a small deterministic two-snapshot transcripts table
(snapshot 1 = the first ``SNAP1_ROWS`` turns; snapshot 2 appends the
rest, including one turn carrying ``NEEDLE`` found nowhere in snapshot
1), split across two input partitions so the scan is genuinely
distributed. This makes the branch's option plumbing, projection and
the snapshot-build -> incremental-append workflow executable anywhere
(tests/test_iceberg_standin.py); with the real jar on the classpath
(README "Deploying against Iceberg") the identical seam code runs
against a real catalog instead.

Registration is explicit and session-scoped::

    session.dataSource.register(IcebergStandIn)

so a bare session still raises the documented clear error.
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

SNAP1_ROWS = 12
SNAP2_ROWS = 18
NEEDLE = "icebergneedle77"


def all_rows():
    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(SNAP2_ROWS):
        conv = f"c{i // 3:04d}"
        text = f"alpha bravo w{i:04d} charlie"
        if i == SNAP1_ROWS + 2:
            text = f"{NEEDLE} delta echo"
        rows.append((conv, i % 3, "user" if i % 2 else "assistant",
                     text, "", t0 + datetime.timedelta(minutes=i)))
    return rows


class _Part(InputPartition):
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi


class _StandInReader(DataSourceReader):
    def __init__(self, options):
        snap = int(options.get("snapshot-id", 2))
        start = options.get("start-snapshot-id")
        end = int(options.get("end-snapshot-id", 2))
        if options.get("as-of-timestamp") is not None:
            snap = 1  # fixture's ts -> snapshot mapping: any as-of = snap 1
        if start is not None:
            # incremental scan: rows appended AFTER `start`, up to `end`
            self.lo = SNAP1_ROWS if int(start) >= 1 else 0
            self.hi = SNAP1_ROWS if end < 2 else SNAP2_ROWS
        else:
            self.lo, self.hi = 0, SNAP1_ROWS if snap < 2 else SNAP2_ROWS

    def partitions(self):
        mid = (self.lo + self.hi) // 2
        return [_Part(self.lo, mid), _Part(mid, self.hi)]

    def read(self, partition):
        for row in all_rows()[partition.lo:partition.hi]:
            yield row


class IcebergStandIn(DataSource):
    @classmethod
    def name(cls):
        return "iceberg"

    def schema(self):
        return ("conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp")

    def reader(self, schema):
        return _StandInReader(self.options)
