"""Arbitrary stateful streaming: a custom per-key sessionizer on
`applyInPandasWithState` (SURVEY.md §2B "arbitrary state").

Why a custom operator when `session_window` exists: the built-in can
only gap-merge and aggregate; this one owns its state dict, so the
same skeleton extends to logic the built-in can't express (session
abandonment scoring, per-session funnels, cross-session carry-over).
The test suite (tests/test_stateful.py) pins its output to the
`session_window` batch twin on the clean-ordered slice where both are
defined, so the custom state machine is verified against the engine's
own sessionization semantics.

Scale/state contract (what makes this safe on an unbounded stream):
- state per key is O(1) — one open session (start, end, n, sum), not
  the event list;
- closed sessions emit as soon as the key sees a post-gap event
  (in-batch close) or when the event-time watermark passes
  session_end + gap (timeout close) — so state for idle keys is
  reclaimed by the watermark, bounding total state by #active keys;
- late events beyond the watermark are dropped by the engine before
  the operator runs (standard append-mode contract).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# Open session: [start_us, end_us] in epoch-micros + running aggregates.
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint, sum_value double"

_US_PER_S = 1_000_000


def _emit(key: int, start_us: int, end_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "sum_value": [sv],
        }
    )


def make_sessionizer(gap_seconds: int):
    """Build the applyInPandasWithState function for a given gap."""
    gap_us = gap_seconds * _US_PER_S

    def sessionize(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            # Watermark passed end+gap with no new events: close and drop.
            start_us, end_us, n, sv = state.get
            state.remove()
            yield _emit(user_id, start_us, end_us, n, sv)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = rows["ts"].astype("int64").to_numpy() // 1_000  # ns -> us
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us[order]
        vals = rows["value"].to_numpy()[order]

        if state.exists:
            start_us, end_us, n, sv = state.get
        else:
            start_us, end_us, n, sv = int(ts_us[0]), int(ts_us[0]), 0, 0.0

        for t, v in zip(ts_us, vals):
            t = int(t)
            if n > 0 and t - end_us > gap_us:
                yield _emit(user_id, start_us, end_us, n, sv)
                start_us, n, sv = t, 0, 0.0
            if n == 0:
                start_us = t
            end_us = max(end_us, t)
            n += 1
            sv += float(v)

        state.update((start_us, end_us, n, sv))
        # Close via timeout once the watermark passes end+gap. The
        # timestamp must be strictly ahead of the current watermark;
        # if it already isn't (a batch of only-old-but-not-late rows),
        # nudge it 1ms past the watermark so the engine accepts it and
        # fires on the next advance.
        timeout_ms = (end_us + gap_us) // 1_000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

    return sessionize


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom sessionizer: one open session per key in managed state,
    closed in-batch on a post-gap event or by event-time timeout."""
    return (
        events.withWatermark(ts_col, watermark)
        .select(key_col, ts_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- token-bucket ADMISSION (the feedback variant) -------------------------
# ts_token_bucket_meter (queries/timeseries.py) computes the METER in
# closed form because its drain ignores verdicts; ADMISSION — where a
# rejected event consumes no tokens — feeds each verdict back into the
# state and is therefore inherently sequential per key.  That is
# exactly what applyInPandasWithState is for: O(1) state per key
# (last event time + token level), verdicts emitted per event.

ADMIT_OUT_SCHEMA = "user_id bigint, ts timestamp, admitted boolean"
ADMIT_STATE_SCHEMA = "last_us bigint, tokens_micro bigint"


def make_admitter(rate_us: int, burst_micro: int, cost_micro: int):
    """Build the applyInPandasWithState fn: refill rate_us micro-tokens
    per microsecond up to burst_micro; an event is admitted iff the
    bucket holds cost_micro, and ONLY admitted events drain it."""

    def admit(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = rows["ts"].astype("int64").to_numpy() // 1_000
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us[order]

        if state.exists:
            last_us, tokens = state.get
        else:
            last_us, tokens = -1, burst_micro  # bucket starts full

        out_ts, out_adm = [], []
        for t in ts_us:
            t = int(t)
            if last_us >= 0:
                # Cross-batch disorder inside the watermark gives
                # t < last_us; clamp so the refill never goes negative
                # and the clock never moves backward — a disordered
                # event sees the bucket as-of the latest time seen.
                tokens = min(burst_micro,
                             tokens + max(0, t - last_us) * rate_us)
            last_us = max(last_us, t)
            ok = tokens >= cost_micro
            if ok:
                tokens -= cost_micro
            out_ts.append(pd.Timestamp(t, unit="us"))
            out_adm.append(ok)

        state.update((last_us, int(tokens)))
        yield pd.DataFrame(
            {"user_id": [user_id] * len(out_ts), "ts": out_ts,
             "admitted": out_adm}
        )

    return admit


def stateful_token_bucket(
    events: DataFrame,
    rate_us: int = 1,
    burst_micro: int = 5_000_000,
    cost_micro: int = 1_000_000,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key token-bucket ADMISSION over a stream: every event gets
    an admitted/rejected verdict, rejected events consume nothing.
    State is two bigints per key — bounded by #keys regardless of
    stream length.  Rows older than the watermark drop before the
    operator runs (the same append-mode contract as the sessionizer
    above); rows disordered WITHIN the watermark across micro-batches
    are clamped — zero refill, monotone clock — so they see the bucket
    as-of the latest time already processed and can never drive the
    level negative."""
    return (
        events.withWatermark(ts_col, watermark)
        .select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            make_admitter(rate_us, burst_micro, cost_micro),
            ADMIT_OUT_SCHEMA,
            ADMIT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
