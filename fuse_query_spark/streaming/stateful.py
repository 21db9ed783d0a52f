"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state API the reference has no analogue for (its
"streams" are stateless batch adapters, SURVEY §2.10).

Running per-user totals: state = (count, sum); each micro-batch folds
its rows into the state and emits the updated totals. State lives in
the state store keyed by user_id — bounded by #users, not #events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum(value)) per user with explicit
    state management."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
