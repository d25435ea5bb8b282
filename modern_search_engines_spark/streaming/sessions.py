"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState`` (the arbitrary-stateful-processing API).

The batch twin is ``contract.q_events_sessions`` (lag-window over
(user_id, ts): a new session starts after a > gap_min gap); here the
per-user state carries finalized running totals PLUS a buffer of
not-yet-finalized events, and each update emits the user's running
totals (output mode ``update``).

Cross-batch exactness: events may arrive OUT OF ORDER across
micro-batches (the round-2 design assumed per-user ts order between
batches and silently over-counted sessions otherwise). Every incoming
event first lands in an in-state buffer; only events at or below the
stream's current watermark are finalized — sorted by (ts, event_id) —
into the (last_ts, n_sessions, n_events) counters, because the
watermark guarantees no earlier event can still arrive (Spark drops
later-than-watermark stragglers before the state function sees them).
Events above the watermark stay buffered and are REPLAYED (sorted, on
top of the finalized counters, without persisting) to emit exact
provisional totals each batch. Consequences:

* any batch split of any arrival order within the watermark delay
  yields exactly the batch twin's totals (tested with a user's events
  shuffled across 3 micro-batches);
* state is O(users) + O(events inside the watermark horizon per user) —
  bounded by the delay; with NO watermark on the stream (watermark = 0)
  nothing ever finalizes, so results stay exact but the buffer grows
  O(events per user) — attach a watermark in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_MIN = 30  # contract.SESSION_GAP_MIN twin

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = ("last_ts double, n_sessions long, n_events long, "
                "buf_ts array<double>, buf_ids array<long>")


def _replay(last_ts, n_sessions, n_events, pairs, gap_s):
    """Fold (ts, event_id)-sorted events into the running counters."""
    for t, _ in pairs:
        if last_ts is None or t - last_ts > gap_s:
            n_sessions += 1
        n_events += 1
        last_ts = t
    return last_ts, n_sessions, n_events


def _session_fn_factory(gap_min: int, retire_after_min: float | None = None):
    gap_s = gap_min * 60.0
    retire_s = (None if retire_after_min is None
                else retire_after_min * 60.0)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events, buf_ts, buf_ids = state.get
            buf = list(zip(buf_ts or [], buf_ids or []))
            last_ts = None if pd.isna(last_ts) else float(last_ts)
        else:
            last_ts, n_sessions, n_events, buf = None, 0, 0, []
        if getattr(state, "hasTimedOut", False):
            # retirement: the watermark passed this user's last activity
            # + retire_after, so every buffered event is ≤ last activity
            # < watermark and finalizes. Emit the final totals once more
            # (idempotent in update mode) and DROP the state — per-user
            # state is O(active users within the horizon), not O(all-time
            # users). A user who returns later restarts from zero — the
            # documented retirement semantics (see sessionize_stream).
            _, f_sessions, f_events = _replay(
                last_ts, n_sessions, n_events, sorted(buf), gap_s)
            state.remove()
            yield pd.DataFrame([{
                "user_id": int(key[0]),
                "n_sessions": int(f_sessions),
                "n_events": int(f_events),
            }])
            return
        rows = pd.concat(list(pdfs))
        buf.extend(zip((ts.timestamp() for ts in rows["ts"]),
                       (int(e) for e in rows["event_id"])))
        buf.sort()
        # finalize the prefix strictly below the watermark: the engine
        # guarantees no earlier event can still arrive (rows at exactly
        # the watermark stay buffered — safe on either drop convention)
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        n_final = 0
        while n_final < len(buf) and buf[n_final][0] < wm_s:
            n_final += 1
        last_ts, n_sessions, n_events = _replay(
            last_ts, n_sessions, n_events, buf[:n_final], gap_s)
        buf = buf[n_final:]
        state.update((float("nan") if last_ts is None else float(last_ts),
                      int(n_sessions), int(n_events),
                      [t for t, _ in buf], [i for _, i in buf]))
        if retire_s is not None:
            # retire when the watermark passes last activity + horizon;
            # EventTimeTimeout requires a timestamp strictly above the
            # current watermark, so clamp (a user already past horizon
            # times out on the next micro-batch)
            latest = max([t for t, _ in buf]
                         + ([last_ts] if last_ts is not None else [0.0]))
            state.setTimeoutTimestamp(
                max(int((latest + retire_s) * 1000),
                    state.getCurrentWatermarkMs() + 1000))
        # provisional totals replay the buffer without persisting it
        _, p_sessions, p_events = _replay(
            last_ts, n_sessions, n_events, buf, gap_s)
        yield pd.DataFrame([{
            "user_id": int(key[0]),
            "n_sessions": int(p_sessions),
            "n_events": int(p_events),
        }])

    return fn


def sessionize_stream(events: DataFrame,
                      gap_min: int = SESSION_GAP_MIN,
                      watermark: str | None = "2 hours",
                      retire_after_min: float | None = None) -> DataFrame:
    """events stream (event_id, ts, user_id, …) → per-user running
    (n_sessions, n_events), one update row per touched user per batch.
    ``watermark=None`` skips the withWatermark call (exact but unbounded
    buffer — see module docstring).

    ``retire_after_min`` bounds the state store by the ACTIVE user set
    instead of the all-time user set: a user idle past the horizon (in
    event time, judged by the watermark) is finalized via an event-time
    timeout — final totals emitted once more, state dropped. Semantics
    tradeoff, stated plainly: a retired user who returns restarts from
    zero, so all-time totals become per-tenure totals for users with
    gaps longer than the horizon. ``None`` (default) keeps the exact
    all-time contract and O(all-time users) state — choose the horizon
    a long-running production stream needs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if retire_after_min is not None and watermark is None:
        raise ValueError("retire_after_min needs a watermark: event-time "
                         "timeouts are judged against it")
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    timeout = (GroupStateTimeout.EventTimeTimeout
               if retire_after_min is not None
               else GroupStateTimeout.NoTimeout)
    return (src
            .select("user_id", "ts", "event_id")
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn_factory(gap_min, retire_after_min),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))
