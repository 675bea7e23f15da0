"""Custom stateful streaming operator: per-user running aggregates with
``applyInPandasWithState`` (the Structured-Streaming extension point for
operators the built-in windowed aggs can't express).

The operator keeps one small state row per user (event count + value sum in
integer cents + last-seen timestamp) and emits the updated totals per user
per micro-batch.  State is bounded by the key cardinality and evicted via
processing-time timeout — the knob the reference never needed (its one
cursor held no state) but a perpetual 10^12-doc feed does.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value_c long"
STATE_SCHEMA = "n_events long, sum_value_c long"


def _make_update_fn(evict: bool):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # HALF_UP (away from zero), matching Spark's F.round in the
            # batch twin — pandas' .round() is half-to-even and diverges on
            # exact half-cents
            cents = pdf["value"].astype(float).mul(100)
            total += int(np.sum(np.sign(cents) * np.floor(np.abs(cents) + 0.5)))
        state.update((n, total))
        if evict:
            state.setTimeoutDuration(60 * 60 * 1000)  # evict idle users after 1h
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_c": [total]}
        )

    return update


def user_totals_stream(events: DataFrame, evict_idle: bool = False) -> DataFrame:
    """Streaming per-user running totals (update-mode output).

    ``evict_idle=True`` enables ProcessingTimeTimeout state eviction for
    perpetual feeds.  NOTE (measured on Spark 4.1): a query with pending
    processing-time timeouts never terminates under ``availableNow`` —
    drain-style runs must use the default NoTimeout.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(evict_idle),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin for equivalence tests."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )
