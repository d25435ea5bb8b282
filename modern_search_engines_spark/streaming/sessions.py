"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState`` (the arbitrary-stateful-processing API).

The batch twin is ``contract.q_events_sessions`` (lag-window over
(user_id, ts): a new session starts after a > gap_min gap); here the
per-user state store carries (last_ts, n_sessions, n_events) across
micro-batches and each update emits the user's running totals
(output mode ``update``). State size is O(users), not O(events).

Ordering contract: events are sorted by (ts, event_id) WITHIN each
micro-batch group call; exactness across batches requires each user's
events to arrive in ts order between micro-batches — true for a
single-drain ``availableNow`` backlog (one micro-batch), the tested
mode. A production deployment with late data pairs this with a
watermark + event buffering in state (same API, more state) — the
operator's shape (keyed state + Arrow-batched group function) is the
part Spark cannot express with built-in aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_MIN = 30  # contract.SESSION_GAP_MIN twin

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"


def _session_fn_factory(gap_min: int):
    gap_s = gap_min * 60.0

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            t = ts.timestamp()
            if last_ts is None or t - last_ts > gap_s:
                n_sessions += 1
            n_events += 1
            last_ts = t
        state.update((float(last_ts), int(n_sessions), int(n_events)))
        yield pd.DataFrame([{
            "user_id": int(key[0]),
            "n_sessions": int(n_sessions),
            "n_events": int(n_events),
        }])

    return fn


def sessionize_stream(events: DataFrame,
                      gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """events stream (event_id, ts, user_id, …) → per-user running
    (n_sessions, n_events), one update row per touched user per batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events
            .select("user_id", "ts", "event_id")
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn_factory(gap_min),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
