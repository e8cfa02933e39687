"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-state path the built-in windows can't express:
a per-user running profile (event count, value sum, last-seen) updated
per micro-batch with explicit timeout-based eviction — the template for
any bespoke stateful operator (fraud counters, CDC merge, per-entity
rollups) at scale, where state lives in the state store partitioned by
the grouping key.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_seen timestamp"
#: last_seen kept as epoch micros — timestamps don't round-trip the
#: state store's pandas conversion cleanly.
STATE_SCHEMA = "n long, total double, last_seen_us long"


def _update_user_profile(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_seen_us = state.get
    else:
        n, total, last_seen_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx_us = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
        last_seen_us = max(last_seen_us, mx_us)
    state.update((int(n), round(float(total), 2), int(last_seen_us)))
    # evict profiles idle past the watermark horizon
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": round(total, 2),
                "last_seen": pd.Timestamp(last_seen_us * 1000),
            }
        ]
    )


def user_profile_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running profile with state timeout — output mode
    'update'."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
