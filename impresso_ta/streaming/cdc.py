"""Streaming CDC materialization: a latest-wins UPSERT changelog with
explicit cross-batch state — the continuous twin of
``operators/cdc.latest_snapshot`` (which replays a complete log as one
window), completing the CDC family the way ``stream_dedup_first_seen``
twins the F3 anti-join and ``stream_debounce`` twins the batch debounce.

Semantics: rows arrive as (key, seq, payload[, op]); the state store
holds, per key, the highest ``seq`` seen so far with its payload and
tombstone flag. A micro-batch emits ONE row per key whose winner
CHANGED — an upsert feed a sink can apply idempotently (MERGE on key,
latest seq wins; ``deleted`` rows drop the key). Replaying the emitted
changelog (last emission per key, tombstones dropped) reproduces the
batch ``latest_snapshot`` of the full log exactly (tested), including
out-of-order arrivals: a LATE row with a lower seq than the stored
winner updates nothing and emits nothing.

Precondition (same contract as ``asof_join``'s right side): ``seq`` is
unique per key — the total order the MERGE resolves on. Equal-seq
duplicates keep the first-seen winner, which is arrival-order-dependent;
make seq unique upstream (compose a tiebreaker into it) if the log can
tie.

Scale posture: state is one tiny tuple per key EVER SEEN — live keys
plus tombstoned ones. Deleted keys are retained (state.update, never
state.remove) because the tombstone is what suppresses a LATE lower-seq
upsert from resurrecting the key; dropping it would trade unbounded
state for wrong answers on out-of-order streams. On a high-churn
stream this retention, not the live-snapshot size, is the real state
bound — age tombstones out with an explicit policy (e.g. a periodic
state rewrite dropping tombstones older than the maximum expected
disorder) when churn demands it. No timeout otherwise: a key's winner
must outlive any idle period (this is a table, not a window). The only shuffle is the groupBy(key) Structured Streaming
needs to co-locate a key's state — the same shuffle the batch window
pays.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CDC_UPSERT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("seq", LongType()),
        StructField("payload", StringType()),
        StructField("deleted", BooleanType()),
    ]
)

# state: the current winner (seq, payload, deleted)
_CDC_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("payload", StringType()),
        StructField("deleted", BooleanType()),
    ]
)


def _cdc_fn(delete_value: str):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        cur = tuple(state.get) if state.exists else None
        best = cur
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                seq = int(row.seq)
                # strict >: a late lower-or-equal seq never dethrones the
                # stored winner (first-seen wins on the documented
                # equal-seq edge)
                if best is None or seq > best[0]:
                    op = getattr(row, "op", None)
                    best = (
                        seq,
                        None if row.payload is None else str(row.payload),
                        op == delete_value,
                    )
        if best is not None and best != cur:
            state.update(best)
            yield pd.DataFrame(
                [
                    {
                        "key": k,
                        "seq": best[0],
                        "payload": best[1],
                        "deleted": best[2],
                    }
                ],
                columns=[f.name for f in CDC_UPSERT_SCHEMA.fields],
            )

    return fn


def stream_latest_wins(
    log: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    payload_col: str = "payload",
    op_col: str | None = None,
    delete_value: str = "delete",
) -> DataFrame:
    """Streaming latest-wins upsert feed over a CDC log stream.

    ``log`` is a streaming DataFrame with at least (key_col, seq_col,
    payload_col); pass ``op_col`` to honor tombstones (rows whose op
    equals ``delete_value`` mark the key deleted when they win).
    Returns the upsert changelog (key, seq, payload, deleted) described
    in the module docstring.
    """
    cols = [
        f"CAST({key_col} AS LONG) AS key",
        f"CAST({seq_col} AS LONG) AS seq",
        f"CAST({payload_col} AS STRING) AS payload",
    ]
    if op_col is not None:
        cols.append(f"CAST({op_col} AS STRING) AS op")
    return (
        log.selectExpr(*cols)
        # a NULL key or seq (including non-numeric values the CAST nulls
        # out) would be a poison pill: int(NaN) fails the task, the
        # checkpoint replays the row, and the stream wedges forever.
        # Drop them here; route malformed CDC records to an error
        # channel UPSTREAM if they must be kept (S15 convention).
        .where("key IS NOT NULL AND seq IS NOT NULL")
        .groupBy("key")
        .applyInPandasWithState(
            _cdc_fn(delete_value),
            outputStructType=CDC_UPSERT_SCHEMA,
            stateStructType=_CDC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
