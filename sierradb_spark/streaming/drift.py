"""Streaming PSI drift alerting (applyInPandasWithState).

The batch twin is ``psi_value_drift`` (operators/stats.py): population
stability index between a reference and a current binned distribution.
That query answers "did the first half drift from the second"; a
deployment wants the MONITOR — a reference window frozen once, then a
PSI reading emitted in the micro-batch each new slice of traffic
arrives in.

Contract (mirrors streaming/alerts.py):

- Input: a stream of ``(key, seq, bin)`` rows — values already binned
  upstream against bounds fixed at deploy time (binning inside the
  monitor would make the reference depend on data it hasn't seen).
  ``seq`` must be strictly increasing per key across micro-batches; a
  row at or below the key's high-water seq is emitted with
  ``late=true`` and does not touch state (folding it would silently
  corrupt the reference/current split).
- State per key: the reference histogram (frozen after the first
  ``ref_target`` in-order rows), the cumulative current histogram,
  and the high-water seq — ``2B + 3`` longs, independent of traffic.
- Output: one row per (key, micro-batch) carrying the consumed row
  count, both totals, the PSI of current vs reference
  (Laplace-smoothed with the SAME formula as the batch query), and
  ``ready`` (false while the reference is still filling).

Arithmetic-identity argument, same as the EWMA monitor: histograms are
exact integers; the PSI formula evaluates over Python IEEE doubles in
a fixed summation order (bin 0..B-1), so a stream-computed PSI equals
a batch recomputation over the same (reference rows, current rows)
split bit-for-bit. The cross-validation test drives the same table
through both paths, across a checkpoint restart.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PSI_BINS = 16
PSI_OUTPUT_SCHEMA = (
    "key string, batch_rows long, late_rows long, ref_n long, cur_n long, "
    "psi double, ready boolean, drifted boolean"
)
_STATE_SCHEMA = (
    "ref array<long>, cur array<long>, ref_n long, cur_n long, "
    "last_seq long"
)
PSI_THRESHOLD = 0.2


def psi_from_counts(ref: list, cur: list, bins: int = PSI_BINS) -> float:
    """Laplace-smoothed PSI, fixed bin-order summation — the identical
    formula (and operation order) the batch oracle evaluates."""
    rn = sum(ref)
    cn = sum(cur)
    psi = 0.0
    for i in range(bins):
        p_ref = (ref[i] + 1.0) / (rn + bins)
        p_cur = (cur[i] + 1.0) / (cn + bins)
        psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
    return psi


def _fold_bins(ref_target: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            ref, cur, ref_n, cur_n, last_seq = state.get
            ref, cur = list(ref), list(cur)
        else:
            ref, cur = [0] * PSI_BINS, [0] * PSI_BINS
            ref_n, cur_n, last_seq = 0, 0, -(2**62)
        consumed = late = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("seq")
            for seq, b in zip(pdf["seq"], pdf["bin"]):
                if pd.isna(seq) or pd.isna(b):
                    # NULL seq/bin arrives as NaN in the Arrow batch;
                    # int(NaN) raises and would wedge the query. Same
                    # routing as an out-of-range bin.
                    late += 1
                    continue
                seq, b = int(seq), int(b)
                if seq <= last_seq:
                    late += 1
                    continue
                if not (0 <= b < PSI_BINS):
                    # Out-of-range bin from a buggy/poison upstream row:
                    # folding it would either raise (b >= PSI_BINS, an
                    # IndexError inside applyInPandasWithState wedges
                    # the whole streaming query) or silently corrupt
                    # the frozen reference (b = -1 increments the LAST
                    # bin). Route it to the late/invalid counter WITHOUT
                    # advancing the high-water: a poison row often has a
                    # poison seq too, and advancing past a bogus huge
                    # seq would permanently skip every later valid row.
                    # A replayed poison row just re-trips this check.
                    late += 1
                    continue
                if ref_n < ref_target:
                    ref[b] += 1
                    ref_n += 1
                else:
                    cur[b] += 1
                    cur_n += 1
                last_seq = seq
                consumed += 1
        state.update((ref, cur, ref_n, cur_n, last_seq))
        ready = ref_n >= ref_target and cur_n > 0
        psi = psi_from_counts(ref, cur) if ready else None
        yield pd.DataFrame(
            [
                (
                    k,
                    consumed,
                    late,
                    ref_n,
                    cur_n,
                    psi,
                    ready,
                    bool(psi is not None and psi > PSI_THRESHOLD),
                )
            ],
            columns=[
                "key",
                "batch_rows",
                "late_rows",
                "ref_n",
                "cur_n",
                "psi",
                "ready",
                "drifted",
            ],
        )

    return fold


def psi_drift_stream(
    binned_stream: DataFrame, ref_target: int = 200
) -> DataFrame:
    """Drift-monitor stream over a (key, seq, bin) stream: one output
    row per (key, micro-batch) with the PSI of everything after the
    frozen ``ref_target``-row reference, Laplace-smoothed exactly like
    the batch ``psi_value_drift`` oracle. Late (seq <= high-water) and
    invalid (bin outside [0, PSI_BINS)) rows are counted in
    ``late_rows`` and skipped — a poison row must neither wedge the
    query nor corrupt the frozen reference histogram."""
    return binned_stream.groupBy("key").applyInPandasWithState(
        _fold_bins(ref_target),
        PSI_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
