"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in operators can't
express (SURVEY.md §2.9 extension; the built-ins cover windows, stream
dedup, and stream-stream joins). The example operator keeps per-key
running totals across micro-batches: state is an explicit (count, total)
record per key, updated with Arrow-batched pandas, emitted once per key
per batch the key appears in.

State discipline at scale: state lives in the state store keyed by the
grouping column — size is O(|distinct keys|), independent of stream
length; pair with a timeout (here ``NoTimeout`` for simplicity; use
``ProcessingTimeTimeout`` + ``state.setTimeoutDuration`` to expire idle
keys on unbounded key domains).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`running_totals_stream`: the same per-key pandas
    accumulation, run through ``applyInPandas`` (batch mode has no state
    store — the whole key group arrives as one pandas frame, which equals
    the stream's final state after its last micro-batch).

    Totals are accumulated in integer CENTS, not floats: ``value`` is
    2-decimal money, and float summation is partition/row-order-dependent,
    which would break cross-engine value hashes. Integer cents are exact
    and order-independent.

    NULL values contribute nothing to the total but still count as
    events — SQL SUM semantics, and what the stream twin's pandas
    ``.sum()`` (NaN-skipping) already does. The dropna also keeps the
    int64 cast total: astype on a NaN-carrying column would throw and
    kill the whole Arrow batch."""

    def _totals(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = int(
            (pdf["value"].dropna() * 100).round().astype("int64").sum()
        )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [cents / 100.0],
            }
        )

    return events.groupBy("event_type").applyInPandas(
        _totals, schema=OUTPUT_SCHEMA
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, total) maintained across
    micro-batches. Emits the updated cumulative row for every key seen in
    the current batch (outputMode must be ``update``)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
