"""Streaming EWMA anomaly alerting (applyInPandasWithState).

The batch twin is ``ewma_anomaly_daily`` (operators/timeseries.py): an
exponentially weighted mean AND variance folded over each key's daily
metric series, flagging days that deviate from the pre-update state by
more than Z EWM sigmas. That query answers "what happened"; a
deployment wants the ALERT STREAM — the flag raised in the micro-batch
the offending day arrives in, not at the next nightly scan.

This operator is that stream, and it is arithmetic-identical to the
batch fold by construction: the per-day recurrence is written with the
same operation order (``mu + a*(v-mu)``; West's variance recurrence),
Python floats ARE IEEE doubles, and CPython does not fuse
multiply-adds — so a day's (level, sigma, flag) here equals the batch
query's state bit-for-bit after any prefix of days. The
cross-validation test folds the same daily table through both paths
and compares final state and anomaly counts exactly.

Ordering contract: days must arrive per-key in non-decreasing order
across micro-batches (the natural shape when an upstream windowed
aggregation emits finalized days). A row at or before the key's
high-water day is NOT folded — it is emitted with ``late=true`` so the
caller can route it to a reconciliation path; silently folding it
would corrupt the recurrence for every later day.

Scale shape: state is 5 doubles + a day per key; each micro-batch
touches only the keys present in it. The engine checkpoints state, so
a restarted query resumes the fold exactly where it left off.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sierradb_spark.operators.timeseries import (
    _EWMA_ALPHA,
    _EWMA_WARMUP,
    _EWMA_Z,
)

ALERT_OUTPUT_SCHEMA = (
    "key string, day date, y double, n_days long, "
    "ewma_level double, ewma_sigma double, "
    "flagged boolean, late boolean, anomaly_days long"
)
_STATE_SCHEMA = (
    "mu double, var double, n double, anom double, last_day long"
)


def _fold_daily(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    if state.exists:
        mu, var, n, anom, last_day = state.get
    else:
        mu, var, n, anom, last_day = None, 0.0, 0.0, 0.0, -(2**62)
    rows = []
    a, w, z = _EWMA_ALPHA, _EWMA_WARMUP, _EWMA_Z
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("day")
        for day, y in zip(pdf["day"], pdf["y"]):
            if pd.isna(day) or pd.isna(y) or not math.isfinite(float(y)):
                # Poison row: a NaT day would raise in toordinal() and
                # wedge the whole streaming query; a NaN/inf value would
                # silently poison mu/var for every later day. Route it
                # out with late=true (the reconciliation channel),
                # touching neither the recurrence nor the high-water.
                d_out = (
                    None
                    if pd.isna(day)
                    else (day.date() if hasattr(day, "date") else day)
                )
                v_out = None if pd.isna(y) else float(y)
                rows.append(
                    (k, d_out, v_out, int(n), mu, None, False, True, int(anom))
                )
                continue
            ordinal = day.toordinal()
            day = day.date() if hasattr(day, "date") else day
            v = float(y)
            if ordinal <= last_day:
                rows.append((k, day, v, int(n), mu, None, False, True, int(anom)))
                continue
            if mu is None:  # first day: init, never flagged
                mu, var, n = v, 0.0, 1.0
                flagged = False
            else:
                # identical order to the batch fold (timeseries.py)
                diff = v - mu  # PRE-update diff feeds flag, mean AND var
                flagged = bool(
                    n >= w and var > 0 and abs(diff) > z * math.sqrt(var)
                )
                anom = anom + (1.0 if flagged else 0.0)
                mu = mu + a * diff
                var = (1 - a) * (var + a * diff * diff)
                n = n + 1
            last_day = ordinal
            rows.append(
                (k, day, v, int(n), mu, math.sqrt(var), flagged, False, int(anom))
            )
    if mu is not None:  # never store a null mean (key saw no real day yet)
        state.update((mu, var, n, anom, last_day))
    yield pd.DataFrame(
        rows,
        columns=[
            "key",
            "day",
            "y",
            "n_days",
            "ewma_level",
            "ewma_sigma",
            "flagged",
            "late",
            "anomaly_days",
        ],
    )


def anomaly_alert_stream(daily_stream: DataFrame) -> DataFrame:
    """Alert stream over a (key, day, y) daily-metric stream: one output
    row per input day carrying the flag, the post-update EWMA state, and
    the running anomaly count. Late (out-of-order) days pass through
    with late=true and do not touch state; so do INVALID rows (null
    day, NaN/inf value), which would otherwise wedge the query or
    silently poison the recurrence."""
    return daily_stream.groupBy("key").applyInPandasWithState(
        _fold_daily,
        ALERT_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
