"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the engine's arbitrary-state path: a per-user running profile
(event count, value sum, distinct event-type bitmap) maintained across
micro-batches — the kind of operator the built-in window aggregations can't
express (cross-window lifetime state, custom merge logic).

Scale notes: state lives in the state store partitioned by the grouping
key (one shuffle per batch on user_id); state size is O(active keys) ×
fixed profile width. A production deployment adds a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to evict idle keys — here
NoTimeout keeps the single-pass demo deterministic.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, "
    "total_value double, types_seen int"
)
STATE_SCHEMA = "total_events long, total_cents long, type_mask int"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    import numpy as np

    total_events, total_cents, type_mask = (
        state.get if state.exists else (0, 0, 0)
    )
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        # Value accounting is in INTEGER CENTS: floor(v*100 + 0.5) is
        # pure IEEE arithmetic (mul, add, floor — no engine-specific
        # half-rounding mode), so any engine computes the identical cent
        # per event, and int64 summation is exact in any order. This is
        # what makes the running profile HASH-CHECKABLE against a SQL
        # oracle: a float accumulator's total depends on summation order
        # (pandas pairwise vs SQL sequential), which can straddle a
        # rounding boundary. State carries cents; /100.0 only at emit
        # (bigint→double division, again bit-identical cross-engine).
        # Non-finite values carry no cents (float-specials contract):
        # treated exactly like NULL → 0, BEFORE the int64 cast (numpy's
        # NaN→int cast is platform-defined garbage, Inf overflows).
        v = pdf["value"].fillna(0.0).to_numpy(dtype="float64")
        v = np.where(np.isfinite(v), v, 0.0)
        total_cents += int(
            np.floor(v * 100.0 + 0.5).astype("int64").sum()
        )
        for et in pdf["event_type"]:
            if et in EVENT_TYPES:
                type_mask |= 1 << EVENT_TYPES.index(et)
    state.update((total_events, total_cents, type_mask))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [total_cents / 100.0],
            "types_seen": [bin(type_mask).count("1")],
        }
    )


def running_user_profile(stream: DataFrame) -> DataFrame:
    """Per-user profile updated every micro-batch; emits one row per
    (user, batch) with the running totals after that batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
