"""Streaming sessionization via ``applyInPandasWithState`` — the custom
stateful operator pattern (SURVEY.md §7 Phase 4).

Same gap semantics as the batch formulation (functions/sessions.py): a
session closes when an event arrives more than ``gap_seconds`` after the
session's last event — or, with the (default) event-time timeout, when the
WATERMARK passes the session's ``last event + gap`` with no follow-up
event at all: the state store sets a per-key event-time timeout at that
instant, and the timed-out invocation emits the session closed at its true
last event and removes the state. Because an event that could still extend
the session (ts ≤ last + gap) is by then behind the watermark, a
timeout-closed session is aggregate-identical to the batch twin's — the
timeout changes WHEN the row is emitted, never its contents
(tests/test_api_and_sessions.py pins the equivalence, including an idle
session closing with no follow-up event).

State size is O(open sessions) and now bounded in TIME as well: idle keys
are evicted at watermark + gap instead of accumulating forever — the
production posture for an unbounded user population. ``event_time_timeout=
False`` restores the keep-state-forever behavior (open sessions emit only
on a closing event). The shuffle is keyed by user — the same partitioning
the batch window uses, so the two formulations scale identically.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, session_idx LONG, session_start TIMESTAMP, "
    "session_end TIMESTAMP, n_events LONG, sum_value DOUBLE"
)
# sum_value is carried as a decimal STRING so the running sum stays exact
# across triggers — float accumulation would diverge from the batch twin's
# decimal-exact sum at the rounding boundary.
STATE_SCHEMA = (
    "session_idx LONG, start_us LONG, last_us LONG, n_events LONG, sum_value STRING"
)


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    event_time_timeout: bool = True,
    watermark_delay: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → closed-session rows.

    With ``event_time_timeout`` (default), the input gets a watermark of
    ``watermark_delay`` on ``ts_col`` and every open session carries an
    event-time timeout at ``last event + gap`` — idle sessions close and
    their state is evicted once the watermark passes that point, without
    needing a later event from the same key."""
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def _row(user_id, session_idx, start_us, last_us, n_events, sum_dec):
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_idx": [session_idx],
                "session_start": [pd.Timestamp(start_us * 1000)],
                "session_end": [pd.Timestamp(last_us * 1000)],
                "n_events": [n_events],
                "sum_value": [
                    float(sum_dec.quantize(six, rounding=ROUND_HALF_UP))
                ],
            }
        )

    def update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from decimal import Decimal

        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last+gap with no follow-up event: the open
            # session is definitively closed at its true last event (any
            # extending event would now be behind the watermark)
            session_idx, start_us, last_us, n_events, sum_str = state.get
            state.remove()
            if start_us is not None:
                yield _row(
                    user_id, session_idx, start_us, last_us, n_events,
                    Decimal(sum_str),
                )
            return

        if state.exists:
            session_idx, start_us, last_us, n_events, sum_str = state.get
            sum_value = Decimal(sum_str)
        else:
            session_idx, start_us, last_us, n_events = 0, None, None, 0
            sum_value = Decimal(0)

        closed: list[tuple] = []
        # A group may span several Arrow chunks in one trigger; chunks carry
        # no ordering guarantee, so sort globally across the whole trigger —
        # per-chunk sorting would interleave sessions out of time order.
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value) // 1000
                # Decimal(repr(v)) == the engines' double→decimal cast for
                # the shortest-repr doubles in this data; exact summation
                # matches the batch twin's decimal(38,9) aggregate.
                v = Decimal(repr(float(value)))
                if start_us is None:
                    session_idx, start_us, last_us = session_idx + 1, ts_us, ts_us
                    n_events, sum_value = 1, v
                elif ts_us - last_us > gap_us:
                    closed.append(
                        (user_id, session_idx, start_us, last_us, n_events, sum_value)
                    )
                    session_idx, start_us, last_us = session_idx + 1, ts_us, ts_us
                    n_events, sum_value = 1, v
                else:
                    last_us = ts_us
                    n_events += 1
                    sum_value += v

        state.update((session_idx, start_us, last_us, n_events, str(sum_value)))
        if event_time_timeout and last_us is not None:
            # fire when the watermark passes last+gap; a desired instant
            # already behind the watermark (late-arriving key) must still
            # be strictly ahead of it, so it fires on the next trigger
            desired_ms = last_us // 1000 + gap_ms
            state.setTimeoutTimestamp(
                max(desired_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.concat(
                [_row(*c) for c in closed], ignore_index=True
            )

    src = (
        events.withWatermark(ts_col, watermark_delay)
        if event_time_timeout
        else events
    )
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if event_time_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
