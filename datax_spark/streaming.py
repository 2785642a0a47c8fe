"""Custom stateful streaming operators (applyInPandasWithState).

The engine's core apply loop is stateless per micro-batch (state lives
in the table); some CDC-operational concerns genuinely need streaming
state. The canonical one: auditing the change stream itself — per-key
lsn continuity across micro-batches (gaps = missed events upstream,
re-deliveries = at-least-once duplicates). State must survive batch
boundaries, so this is Spark's arbitrary-stateful-processing surface,
Arrow-batched via pandas (no per-row Python in the hot loop: each call
processes a whole group's batch slice as a pandas DataFrame).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def audit_schemas(key_col: str, key_type: str = "long"):
    out = T.StructType([
        T.StructField(key_col, T._parse_datatype_string(key_type)),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_redelivered", T.LongType()),
    ])
    state = T.StructType([
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_redelivered", T.LongType()),
    ])
    return out, state


def stateful_lsn_audit(
    df: DataFrame,
    key_col: str = "user_id",
    lsn_col: str = "event_id",
    key_type: str = "long",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key lsn continuity audit with cross-batch state.

    Within each micro-batch a key's events are processed in lsn order;
    against the carried state: lsn ≤ max_lsn seen → re-delivery;
    a jump past max_lsn + 1 → gap (when state exists — the key's very
    first event opens the sequence). n_events counts EVERY event seen
    (redeliveries included — they arrived), so a drained single-pass
    run equals the batch `count(*)` fold. Emits the running totals per
    key per batch (update mode).

    The whole batch slice is processed with pandas vector ops
    (sort/diff/boolean sums) — no per-row Python: the per-batch cost
    is O(n log n) C-side sort + a few vectorized passes.

    `idle_timeout_ms` (e.g. 30*60*1000): on an UNBOUNDED keyspace the
    per-key state otherwise grows monotonically forever. When set, a
    key idle past the duration is EVICTED — its final running totals
    are emitted one last time and the state removed; if the key later
    reappears its audit restarts fresh (a restart is indistinguishable
    from a first sight, so cross-eviction gaps are not counted — the
    documented trade-off of bounding state). Default None keeps
    NoTimeout for bounded replays (oracle-identical to the batch fold).

    Use idle_timeout_ms only with clock-triggered (continuous /
    processingTime) streams: processing-time timers under an
    availableNow drain keep scheduling empty micro-batches and the
    drain never terminates (measured on this Spark: 50+ empty batches)
    — bounded replays should keep the NoTimeout default.
    """
    out_schema, state_schema = audit_schemas(key_col, key_type)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists and state.hasTimedOut:
            # idle eviction: emit the final snapshot, drop the state
            n_events, max_lsn, n_gaps, n_re = state.get
            state.remove()
            yield pd.DataFrame(
                [{key_col: key[0], "n_events": n_events, "max_lsn": max_lsn,
                  "n_gaps": n_gaps, "n_redelivered": n_re}]
            )
            return
        if state.exists:
            n_events, max_lsn, n_gaps, n_re = state.get
        else:
            n_events, max_lsn, n_gaps, n_re = 0, None, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            s = pdf[lsn_col].astype("int64").sort_values(ignore_index=True)
            n_events += len(s)
            if max_lsn is not None:
                n_re += int((s <= max_lsn).sum())  # carried-state redeliveries
                rest = s[s > max_lsn].reset_index(drop=True)
            else:
                rest = s
            if len(rest):
                d = rest.diff()  # first element NaN → excluded from both sums
                n_re += int((d == 0).sum())  # in-batch duplicates
                n_gaps += int((d > 1).sum())
                if max_lsn is not None and int(rest.iloc[0]) > max_lsn + 1:
                    n_gaps += 1  # gap across the batch boundary
                max_lsn = int(rest.iloc[-1])
        state.update((n_events, max_lsn, n_gaps, n_re))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{key_col: key[0], "n_events": n_events, "max_lsn": max_lsn,
              "n_gaps": n_gaps, "n_redelivered": n_re}]
        )

    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", timeout
    )
