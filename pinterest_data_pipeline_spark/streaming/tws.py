"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (streaming/stateful.py
keeps the classic form): state is declared as named, schema-typed
variables on a ``StatefulProcessor`` instead of one opaque tuple, and the
runtime adds per-state TTL, timers, and initial-state hydration. Both
implementations of the same running-totals operator are kept side by side
so a user can migrate between the two APIs with a test pinning equality
(tests/test_streaming.py::test_tws_matches_classic_stateful).

Money is accumulated in integer CENTS inside state (exact,
order-independent) and converted to 2-decimal currency only at emission —
the same determinism discipline as the classic twin.

Scale notes: state is keyed by the grouping column and lives in the state
store (RocksDB-switchable, see tests/test_sources_orchestration.py) —
O(|distinct keys|) regardless of stream length; declared-schema value
state serializes as Arrow rather than pickled tuples, which is the format
a 1000-executor state store compaction actually wants.

Environment caveat: the transformWithState Python runtime talks to the
JVM state server over protobuf, which is NOT installed in this container
(no network installs), so the end-to-end test is skip-gated on
``google.protobuf`` availability. Everything here is plain public PySpark
API and runs wherever the ``pyspark[connect]`` protobuf dependency is
present; the classic twin (streaming/stateful.py) covers the semantics in
this environment's tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "event_type string, n_events bigint, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, cents) maintained in a ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, cents bigint")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, cents = self._totals.get()
        else:
            n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas running totals; outputMode must be
    ``update`` downstream, timeMode ``None`` (no timers — add
    ``ProcessingTime`` + ``handleExpiredTimer`` to expire idle keys on an
    unbounded key domain)."""
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
