"""Streaming quantile monitor — bounded KLL/MRL sketch state per key.

The streaming twin of ``operators.sketches.quantile_rollup_sketch``
(r12): per event_type, the state store holds TWO deterministic
quantile sketches — the open DAY's and the open MONTH's merged
accumulation — via ``applyInPandasWithState``.  Like the SpaceSaving
twin this is bounded-sketch state (O(k·log(n/k)) values regardless of
stream length), but unlike it the sketch is MERGEABLE, so the monitor
reproduces the batch rollup's day-ascending merge exactly: a day
closes when a later day's first event arrives (the forward-only
contract of ``streaming/observations.py``), merging the day sketch
into the month sketch; a month closes when a later month's day opens,
emitting the sealed row (``is_final = true``).

Every micro-batch that touches a series also emits a PROVISIONAL row
(``is_final = false``) for the open month — the month sketch merged
with a COPY of the open day sketch — so the freshest estimate is
always visible in update mode, and a drained in-order stream's
provisional rows equal ``quantile_rollup_sketch``'s est columns
bit-for-bit (the batch-parity test).

Late rows (day precedes the open day — a contract violation across
micro-batches) are dropped and counted in ``n_late``, the observable
-not-silent convention the CUSUM monitor adopted in r12.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import QUANTILE_K, QUANTILE_PS, QuantileSketch

STATE_SCHEMA = StructType(
    [
        # month + day sketches, levels flattened (values ++ sizes)
        StructField("m_vals", ArrayType(DoubleType())),
        StructField("m_sizes", ArrayType(LongType())),
        StructField("m_parity", ArrayType(BooleanType())),
        StructField("m_n", LongType()),
        StructField("m_err", LongType()),
        StructField("d_vals", ArrayType(DoubleType())),
        StructField("d_sizes", ArrayType(LongType())),
        StructField("d_parity", ArrayType(BooleanType())),
        StructField("d_n", LongType()),
        StructField("d_err", LongType()),
        StructField("open_ord", LongType()),
        StructField("n_late", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("month", DateType()),
        StructField("n_rows", LongType()),
        StructField("est_p50", DoubleType()),
        StructField("est_p95", DoubleType()),
        StructField("max_rank_error", LongType()),
        StructField("is_final", BooleanType()),
        StructField("n_late", LongType()),
    ]
)


def _flatten(sk: QuantileSketch) -> tuple[list, list, list, int, int]:
    vals = [v for lvl in sk.levels for v in lvl]
    sizes = [len(lvl) for lvl in sk.levels]
    return vals, sizes, sk.parity, sk.n, sk.rank_err


def _unflatten(k, vals, sizes, parity, n, err) -> QuantileSketch:
    levels, pos = [], 0
    for s in sizes:
        levels.append(list(vals[pos : pos + int(s)]))
        pos += int(s)
    return QuantileSketch.from_state(k, levels or [[]], list(parity) or [False], n, err)


def _make_update(k: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            (mv, ms, mp, mn, me, dv, ds, dp, dn, de, open_ord, n_late) = (
                state.get
            )
            month_sk = _unflatten(k, mv, ms, mp, mn, me)
            day_sk = _unflatten(k, dv, ds, dp, dn, de)
            open_ord = None if open_ord is None or open_ord < 0 else int(open_ord)
            n_late = int(n_late)
        else:
            month_sk, day_sk, open_ord, n_late = (
                QuantileSketch(k),
                QuantileSketch(k),
                None,
                0,
            )

        rows: list[tuple] = []

        def _emit(sk: QuantileSketch, month_first: date, final: bool) -> None:
            rows.append(
                (
                    event_type,
                    month_first,
                    sk.n,
                    sk.query(QUANTILE_PS[0][1], QUANTILE_PS[0][2]),
                    sk.query(QUANTILE_PS[1][1], QUANTILE_PS[1][2]),
                    sk.rank_err,
                    final,
                    n_late,
                )
            )

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = pd.concat(chunks).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            for ts, value in zip(merged["ts"], merged["value"]):
                if pd.isna(ts) or pd.isna(value):
                    continue  # the batch twin's value-not-null filter
                d = ts.date()
                d_ord = d.toordinal()
                if open_ord is None:
                    open_ord = d_ord
                elif d_ord > open_ord:
                    # close the day into the month (day-ascending
                    # merge, the batch contract — the FIRST day
                    # REPLACES the empty month sketch so its parity
                    # flags carry exactly like the batch twin's
                    # ``merged = daily[0]`` base) …
                    prev = date.fromordinal(open_ord)
                    if month_sk.n == 0:
                        month_sk = day_sk
                    else:
                        month_sk.merge(day_sk)
                    day_sk = QuantileSketch(k)
                    # … and seal the month when we crossed into a new one
                    if (d.year, d.month) != (prev.year, prev.month):
                        _emit(month_sk, prev.replace(day=1), True)
                        month_sk = QuantileSketch(k)
                    open_ord = d_ord
                elif d_ord < open_ord:
                    n_late += 1  # dropped, observable — never misattributed
                    continue
                day_sk.add(float(value))

        if open_ord is not None:
            # provisional open-month estimate: month ++ a COPY of the
            # open day (state itself stays un-merged; first-day
            # replacement mirrors the close path)
            if month_sk.n == 0:
                snap = _unflatten(k, *_flatten(day_sk))
            else:
                snap = _unflatten(k, *_flatten(month_sk))
                snap.merge(_unflatten(k, *_flatten(day_sk)))
            if snap.n:
                _emit(snap, date.fromordinal(open_ord).replace(day=1), False)

        mv, ms, mp, mn, me = _flatten(month_sk)
        dv, ds, dp, dn, de = _flatten(day_sk)
        state.update(
            (mv, ms, mp, mn, me, dv, ds, dp, dn, de,
             -1 if open_ord is None else open_ord, n_late)
        )
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type", "month", "n_rows", "est_p50", "est_p95",
                "max_rank_error", "is_final", "n_late",
            ],
        )

    return _update


def quantile_monitor_stream(
    events_stream: DataFrame, k: int = QUANTILE_K
) -> DataFrame:
    """Per-event-type monthly quantile monitor over the event stream.

    Output (update mode): a provisional open-month row per touched
    series per micro-batch, plus a sealed ``is_final`` row whenever a
    month closes."""
    return (
        events_stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
