"""Streaming Pareto-frontier monitor — monotone order-independent state.

The streaming twin of ``operators.relational.part_skyline``: part rows
arrive as a stream and each price-bucket's LOCAL frontier lives in the
state store.  Two properties make the skyline an unusually well-behaved
streaming operator, and both are pinned in tests:

* the frontier of a SET is order-independent — unlike sessions, CUSUM,
  or SpaceSaving, ANY micro-batch interleaving converges to the same
  state, so drain parity needs no ordering contract;
* the state is MONOTONE — a new point either bounces off the frontier
  or shrinks-and-joins it; state size is bounded by the bucket's
  frontier (O(log n) expected on independent dimensions), never the
  stream length.

Sharding: key-space partition by the same fixed-width price bucket the
batch operator uses.  Local frontiers OVERAPPROXIMATE the global
skyline (skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B)); the consumer folds
the drained bucket frontiers — a frontier-sized frame — through one
global skyline pass, exactly the batch operator's carry step.

Dominance contract (shared with part_skyline): lower-or-equal price
AND greater-or-equal size, strict in one; equal (price, size)
duplicates coexist and are carried as ``n_ties``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("prices", ArrayType(DoubleType())),
        StructField("sizes", ArrayType(IntegerType())),
        StructField("ties", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("price", DoubleType()),
        StructField("size", IntegerType()),
        StructField("n_ties", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def frontier_insert(
    frontier: dict[tuple[float, int], int], price: float, size: int
) -> None:
    """One skyline step on ``frontier`` ((price, size) -> tie count)."""
    for fp, fs in frontier:
        if (fp <= price and fs >= size) and (fp < price or fs > size):
            return  # dominated — frontier unchanged
    if (price, size) in frontier:
        frontier[(price, size)] += 1
        return
    for key in [
        (fp, fs)
        for fp, fs in frontier
        if (price <= fp and size >= fs) and (price < fp or size > fs)
    ]:
        del frontier[key]
    frontier[(price, size)] = 1


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (bucket,) = key
    if state.exists:
        prices, sizes, ties, n_seen = state.get
        frontier = {
            (float(p), int(s)): int(t) for p, s, t in zip(prices, sizes, ties)
        }
    else:
        frontier, n_seen = {}, 0

    for pdf in pdfs:
        for price, size in zip(pdf["p_retailprice"], pdf["p_size"]):
            frontier_insert(frontier, float(price), int(size))
        n_seen += len(pdf)

    ranked = sorted(frontier.items())
    state.update(
        (
            [p for (p, _s), _t in ranked],
            [s for (_p, s), _t in ranked],
            [t for _k, t in ranked],
            n_seen,
        )
    )
    yield pd.DataFrame(
        {
            "bucket": pd.array([int(bucket)] * len(ranked), dtype="int64"),
            "price": pd.array([p for (p, _s), _t in ranked], dtype="float64"),
            "size": pd.array([s for (_p, s), _t in ranked], dtype="int32"),
            "n_ties": pd.array([t for _k, t in ranked], dtype="int64"),
            "n_seen": pd.array([n_seen] * len(ranked), dtype="int64"),
        }
    )


def skyline_stream(
    parts_stream: DataFrame, price_bucket_width: float = 100.0
) -> DataFrame:
    """Per-price-bucket local Pareto frontiers over the part stream.

    Output (update mode): each bucket's full current frontier every
    micro-batch it receives rows; ``n_seen`` is monotone per bucket,
    so the freshest frontier is the max-``n_seen`` row set."""
    return (
        parts_stream.select(
            F.floor(F.col("p_retailprice") / F.lit(price_bucket_width)).alias(
                "bucket"
            ),
            "p_retailprice",
            "p_size",
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
