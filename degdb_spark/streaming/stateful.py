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
    if state.hasTimedOut:
        # idle past the horizon: drop the profile so state stays bounded
        # (a later event re-creates it from scratch)
        state.remove()
        yield pd.DataFrame(columns=["user_id", "n_events", "total_value", "last_seen"])
        return
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


CAP_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp"
CAP_STATE_SCHEMA = "n long"
_CAP = 3


def _cap_per_user(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit at most ``_CAP`` events per user per activity horizon
    (first-arrival order within the micro-batch pinned by (ts,
    event_id) sort for determinism). State is one counter per user —
    the streaming twin of the batch per-key capping primitive
    (queries/coverage_queries.py::events_per_user_cap; batch uses a
    stable-hash order, streaming necessarily uses arrival order)."""
    (user_id,) = key
    if state.hasTimedOut:
        # evict the counter once the user has been idle past the
        # horizon — the cap therefore applies per activity horizon, not
        # per stream lifetime (bounded state is the point; a truly
        # lifetime cap would grow state with the user universe forever)
        state.remove()
        yield pd.DataFrame(columns=["user_id", "event_id", "ts"])
        return
    n = state.get[0] if state.exists else 0
    out = []
    for pdf in pdfs:
        if n >= _CAP:
            break
        pdf = pdf.sort_values(["ts", "event_id"])
        take = pdf.head(_CAP - n)
        n += len(take)
        out.append(take[["user_id", "event_id", "ts"]])
    state.update((int(n),))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
    yield (
        pd.concat(out)
        if out
        else pd.DataFrame(columns=["user_id", "event_id", "ts"])
    )



FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, view_ts timestamp, click_ts timestamp, purchase_ts timestamp"
)
#: stage times as epoch micros, 0 = not reached; done flag stops
#: re-emission after conversion
FUNNEL_STATE_SCHEMA = "t1_us long, t2_us long, t3_us long, done long"
_FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_per_user(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel progression (view → click → purchase, strictly
    increasing event time): emits ONE conversion row the moment the
    final stage is hit — the CEP-style streaming twin of the batch
    queries/behavior_queries.py::events_funnel (same strict-> stage
    predicate; batch takes global minima, streaming the first
    qualifying event in event-time order, which agree on in-order
    data). State is three stage timestamps + a done flag per user,
    evicted on event-time timeout (funnel abandonment)."""
    (user_id,) = key
    if state.hasTimedOut:
        # abandonment: user idle past the horizon without converting
        state.remove()
        yield pd.DataFrame(
            columns=["user_id", "view_ts", "click_ts", "purchase_ts"]
        )
        return
    t1, t2, t3, done = state.get if state.exists else (0, 0, 0, 0)
    converted = False
    for pdf in pdfs:
        if done:
            break
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if etype == _FUNNEL_STAGES[0] and t1 == 0:
                t1 = us
            elif etype == _FUNNEL_STAGES[1] and t1 and us > t1 and t2 == 0:
                t2 = us
            elif etype == _FUNNEL_STAGES[2] and t2 and us > t2 and t3 == 0:
                t3 = us
                done, converted = 1, True
                break
    state.update((int(t1), int(t2), int(t3), int(done)))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
    if converted:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "view_ts": pd.Timestamp(t1 * 1000),
                    "click_ts": pd.Timestamp(t2 * 1000),
                    "purchase_ts": pd.Timestamp(t3 * 1000),
                }
            ]
        )
    else:
        yield pd.DataFrame(
            columns=["user_id", "view_ts", "click_ts", "purchase_ts"]
        )


def funnel_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming funnel conversions (append mode): one row per user at
    the moment their purchase completes the strictly-ordered
    view→click→purchase sequence. Bounded state: 4 longs per active
    user, removed on timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_per_user,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DECAY_OUTPUT_SCHEMA = "user_id long, decay_score double, n_events long"
DECAY_STATE_SCHEMA = "score double, n long"
_DECAY = 0.5


def _decay_per_user(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Recency-decayed engagement score maintained incrementally:
    score ← score·0.5 + value per event in event-time order — the
    O(1)-state streaming twin of the batch
    queries/behavior_queries.py::events_decay_score (which ranks by
    recency; on in-order data both equal Σ value·0.5^age). 0.5 is a
    terminating binary fraction, so the update is exact float
    arithmetic and replayable. State: one (score, count) per user,
    evicted on event-time timeout."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=["user_id", "decay_score", "n_events"])
        return
    score, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            score = score * _DECAY + float(v)
            n += 1
    state.update((float(score), int(n)))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
    yield pd.DataFrame(
        [{"user_id": user_id, "decay_score": score, "n_events": n}]
    )


def decay_score_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running decayed engagement (update mode) — O(1) state
    per user, the incremental form of the batch decay score."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _decay_per_user,
            outputStructType=DECAY_OUTPUT_SCHEMA,
            stateStructType=DECAY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def cap_per_user_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keep the first ``_CAP`` events per user *per activity horizon*
    (append mode) — bounded per-key state (one counter), genuinely
    removed on event-time timeout; a user idle past the horizon starts a
    fresh cap on their next event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _cap_per_user,
            outputStructType=CAP_OUTPUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
