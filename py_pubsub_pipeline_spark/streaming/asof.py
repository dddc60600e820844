"""Grouped as-of join over streaming state (`applyInPandasWithState`).

The batch as-of join (queries/asof.py::join_asof: each purchase joined
to the same user's most recent view at-or-before it) re-sorts the
whole timeline; a stream can't.  The streaming form keeps O(1) state
per key — the latest view timestamp seen so far — and resolves each
purchase against that state the moment it arrives: the classic
trades-asof-quotes shape (quote stream updates state, trade stream
probes it), grouped by key.

This is the `transformWithState` use case; that API remains
env-blocked in this container (google.protobuf absent, SURVEY §2C),
so the operator rides `applyInPandasWithState` like the sessionizer.

Semantics/state contract:
- state per key: ONE bigint (latest view epoch-µs) — never the event
  list; total state is bounded by #keys with at least one view.
- within a micro-batch, rows are sorted by (ts, side) with views
  (side 0) before purchases (side 1) at equal timestamps — DuckDB
  ASOF's >= tie rule, the same ordering the batch twin builds.
- ARRIVAL-ORDERED contract across batches: a view that arrives in a
  later batch than a purchase with a later-or-equal event time cannot
  retro-fill that purchase (the purchase already emitted).  On an
  event-time-ordered replay (a commit-log source draining in order)
  the output equals the batch twin exactly —
  tests/test_streaming_asof.py pins that convergence, crash included.
- idle keys: state is one bigint; eviction under a retention SLA
  would use an event-time timeout exactly like the sessionizer's —
  omitted here because as-of state (unlike an open session) is
  meaningful forever.

Scale: one shuffle on the key (the same partitioning the batch twin's
window uses); per-batch work is a vectorized pandas pass per key
group.  At 100 TB the state store is RocksDB-backed per partition and
the operator's state row is 8 bytes per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "event_id bigint, user_id bigint, purchase_ts timestamp, "
    "view_ts timestamp"
)
STATE_SCHEMA = "last_view_us bigint"


def grouped_asof_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — no timeout registered
        state.remove()
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    ts_us = rows["ts"].astype("int64").to_numpy() // 1_000  # ns -> us
    side = (rows["event_type"] == "purchase").astype("int64").to_numpy()
    order = pd.DataFrame({"t": ts_us, "s": side}).sort_values(
        ["t", "s"], kind="stable"
    ).index.to_numpy()

    last_view = state.get[0] if state.exists else None
    out_event, out_pts, out_vts = [], [], []
    eids = rows["event_id"].to_numpy()
    for i in order:
        if side[i] == 0:  # view: advance state
            t = int(ts_us[i])
            if last_view is None or t > last_view:
                last_view = t
        else:  # purchase: probe state
            out_event.append(int(eids[i]))
            out_pts.append(int(ts_us[i]))
            out_vts.append(last_view)
    if last_view is not None:
        state.update((int(last_view),))
    if out_event:
        yield pd.DataFrame({
            "event_id": out_event,
            "user_id": [user_id] * len(out_event),
            "purchase_ts": pd.to_datetime(out_pts, unit="us"),
            "view_ts": pd.to_datetime(
                pd.Series(out_vts, dtype="float64"), unit="us"
            ),
        })


def stateful_grouped_asof(events: DataFrame) -> DataFrame:
    """events: streaming frame with (event_id, user_id, event_type,
    ts); views update per-user state, purchases emit joined rows."""
    return (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            grouped_asof_fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
