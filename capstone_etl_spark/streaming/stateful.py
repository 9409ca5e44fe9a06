"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Spark's built-in streaming aggregations
can't express (SURVEY.md §2.8): arbitrary per-key state evolved across
micro-batches in Arrow-batched pandas. Demonstrated with a per-user
running activity accumulator (event count + value sum + last-seen
epoch) — the skeleton generalizes to CEP-style patterns, decaying
counters, per-entity models.

Scale notes: state lives in the executor state store partitioned by
the grouping key (user_id — high-cardinality, unskewed); each
micro-batch touches only keys present in that batch. Arrow transfer
batches rows per key-group — never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen_sec long"
)
STATE_SCHEMA = "n long, cents long, last_sec long"


def _accumulate(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # State accumulates EXACT integer cents (per-row rounding), never a
    # running float — float accumulation is micro-batch-order dependent,
    # which would make the final state irreproducible across replays and
    # impossible to oracle. cents/100.0 at emit time is one correctly-
    # rounded IEEE division, identical to a DECIMAL(18,2) sum cast to
    # double.
    n, cents, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        if len(pdf):
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            last = max(last, int(pdf["ts_sec"].max()))
    state.update((n, cents, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_seen_sec": [last],
        }
    )


def running_user_activity(events: DataFrame) -> DataFrame:
    """Per-user running (count, value sum, last-seen) evolved across
    micro-batches; emits the updated row for every user seen in each
    batch (update output mode)."""
    prepared = events.select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.col("ts").cast("long").alias("ts_sec"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
