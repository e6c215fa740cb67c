"""Custom STATEFUL streaming operator: gap-based sessionization with
applyInPandasWithState — the Structured-Streaming shape for operators
the built-in windowed aggs can't express (per-key custom state machines).

Semantics match the batch sessionizer (__spark_entry__.q_events_sessions
/ its SQL twin): events of one user belong to one session while
consecutive gaps are <= gap_sec; a larger gap CLOSES the session, which
is emitted downstream. The currently-open session per user lives in the
group state across micro-batches and is emitted only when a later event
closes it (production deployments add an EventTimeTimeout to flush idle
sessions; kept NoTimeout here so availableNow test runs are exactly
comparable to the batch twin).

Ordering: events are sorted by ts WITHIN each micro-batch's key group;
cross-batch disorder is the caller's watermark problem (the test feeds
time-ordered files, mirroring a watermarked production source).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUT_SCHEMA = ("user_id string, session_start timestamp, "
              "session_end timestamp, n_events int")
STATE_SCHEMA = "start long, last long, n int"

_US = 1_000_000


def _sessionizer(gap_sec: int):
    gap_us = gap_sec * _US

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # datetime64[ns] -> epoch microseconds (int)
        ts = (rows["ts"].astype("int64") // 1000).sort_values().to_numpy()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts:
            t = int(t)
            if last is not None and t - last > gap_us:
                closed.append((key[0], start, last, n))
                start, n = None, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((int(start), int(last), int(n)))
        if closed:
            out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                                "session_end", "n_events"])
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            out["n_events"] = out["n_events"].astype("int32")
            yield out

    return fn


def sessionize_stream(events_stream, gap_sec: int = 1800):
    """events_stream: streaming DataFrame(user_id, ts, ...). Returns an
    unstarted streaming DataFrame of CLOSED sessions (caller picks the
    sink/trigger)."""
    from pyspark.sql import functions as F
    return (events_stream
            .select(F.col("user_id").cast("string").alias("user_id"), "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionizer(gap_sec),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf="NoTimeout"))
