"""Streaming sessionization via ``applyInPandasWithState`` — the custom
stateful operator pattern (SURVEY.md §7 Phase 4).

Same gap semantics as the batch formulation (functions/sessions.py): a
session closes when an event arrives more than ``gap_seconds`` after the
session's last event. State per user = the open session's aggregates; closed
sessions are emitted as soon as the closing event arrives. Sessions still
open when the (finite) stream ends remain in state — exactly the streaming
contract (they would close on a later trigger or state timeout).

State size is O(users); the shuffle is keyed by user — the same partitioning
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
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → closed-session rows."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")

        (user_id,) = key
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
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_idx": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[3] * 1000) for c in closed],
                    "n_events": [c[4] for c in closed],
                    "sum_value": [
                        float(c[5].quantize(six, rounding=ROUND_HALF_UP))
                        for c in closed
                    ],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
