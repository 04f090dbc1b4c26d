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
plus tombstoned ones. Deleted keys are retained by default
(state.update, never state.remove) because the tombstone is what
suppresses a LATE lower-seq upsert from resurrecting the key; dropping
it unconditionally would trade unbounded state for wrong answers on
out-of-order streams. On a high-churn stream this retention, not the
live-snapshot size, is the real state bound — pass ``tombstone_ttl``
(opt-in, requires an event-time column) to age tombstones out past a
retention horizon: a tombstone whose winning row carries event time T
is removed from state once the stream's watermark passes T + ttl (the
same event-time-timeout GC ``stream_debounce`` uses for its anchors).
The trade, explicitly: after the horizon, a late lower-seq row for that
key is ACCEPTED as a fresh winner (resurrection) — the retention bound
IS the disorder bound, so set ttl to the maximum disorder the source
can produce. The watermark delay equals ttl, so rows more than ttl
late in EVENT time are dropped by the engine before the state op sees
them. Live keys never time out: a key's winner must outlive any idle
period (this is a table, not a window). The only shuffle is the
groupBy(key) Structured Streaming needs to co-locate a key's state —
the same shuffle the batch window pays.
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

# state: the current winner (seq, payload, deleted, event-time millis).
# ts is NULL when the stream runs without tombstone_ttl — kept in the
# schema unconditionally so the two modes share one state layout.
# MIGRATION NOTE: this widened the r9 3-field layout — a checkpoint
# written by the 3-field version fails Spark's state-store schema
# compatibility check on restart (loud, at startup); restart such
# streams from a fresh checkpoint (replaying the log reproduces the
# state — the changelog is the documented recovery path). Within the
# 4-field layout, TTL mode handles legacy ts=NULL tombstones (see the
# re-arm guard in _cdc_fn).
_CDC_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("payload", StringType()),
        StructField("deleted", BooleanType()),
        StructField("ts", LongType()),
    ]
)


def _cdc_fn(delete_value: str, has_op: bool, ttl_ms: int | None = None):
    """``has_op`` is decided at PLAN time from the caller's ``op_col``
    argument — not discovered per row — so a source column that happens
    to be named ``op`` can never silently enable tombstone semantics
    when the caller asked for none (and vice versa)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            # tombstone past its retention horizon: drop the state (GC
            # only — the downstream materialization already removed the
            # key when the tombstone was emitted; nothing to emit here).
            # From now on a late lower-seq row is accepted as fresh —
            # the documented trade.
            state.remove()
            return
        cur = tuple(state.get) if state.exists else None
        best = cur
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                seq = int(row.seq)
                # strict >: a late lower-or-equal seq never dethrones the
                # stored winner (first-seen wins on the documented
                # equal-seq edge)
                if best is None or seq > best[0]:
                    op = getattr(row, "op", None) if has_op else None
                    ts = None
                    if ttl_ms is not None:
                        # ts_ms is computed IN THE PLAN (unix_millis,
                        # true epoch) — the TIMESTAMP column arrives in
                        # the pandas worker localized to
                        # spark.sql.session.timeZone, so converting it
                        # here would shift every tombstone horizon by
                        # the session's UTC offset while
                        # getCurrentWatermarkMs stays true epoch
                        ts = int(row.ts_ms)
                    best = (
                        seq,
                        None if row.payload is None else str(row.payload),
                        op == delete_value,
                        ts,
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
        if ttl_ms is not None and best is not None and best[2]:
            # re-arm on EVERY invocation (Spark clears a key's timeout
            # each time its function runs with data): the tombstone ages
            # out when the watermark passes its event time + ttl. The
            # max() guard keeps the registration legal if the watermark
            # already passed the horizon (fires next batch). A tombstone
            # whose state predates TTL mode carries ts=NULL (the shared
            # 4-field layout) — age it from the CURRENT watermark
            # instead of crashing the pandas worker on None + int (the
            # poison-pill class: task fails, checkpoint replays,
            # forever).
            wm = state.getCurrentWatermarkMs()
            anchor = best[3] if best[3] is not None else wm
            state.setTimeoutTimestamp(max(anchor + ttl_ms, wm + 1))

    return fn


def stream_latest_wins(
    log: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    payload_col: str = "payload",
    op_col: str | None = None,
    delete_value: str = "delete",
    ts_col: str | None = None,
    tombstone_ttl: str | None = None,
) -> DataFrame:
    """Streaming latest-wins upsert feed over a CDC log stream.

    ``log`` is a streaming DataFrame with at least (key_col, seq_col,
    payload_col); pass ``op_col`` to honor tombstones (rows whose op
    equals ``delete_value`` mark the key deleted when they win).
    Returns the upsert changelog (key, seq, payload, deleted) described
    in the module docstring.

    ``tombstone_ttl`` (e.g. ``"1 hour"``; requires ``ts_col``, an
    event-time column) opts into tombstone ageing: the stream is
    watermarked on ``ts_col`` with delay = ttl, and a tombstoned key's
    state is removed once the watermark passes the tombstone's event
    time + ttl. See the module docstring for the resurrection trade.
    """
    if tombstone_ttl is not None and ts_col is None:
        raise ValueError(
            "stream_latest_wins: tombstone_ttl requires ts_col (the "
            "event-time column the retention horizon is measured on)"
        )
    cols = [
        f"CAST({key_col} AS LONG) AS key",
        f"CAST({seq_col} AS LONG) AS seq",
        f"CAST({payload_col} AS STRING) AS payload",
    ]
    if op_col is not None:
        cols.append(f"CAST({op_col} AS STRING) AS op")
    ttl_ms: int | None = None
    if tombstone_ttl is not None:
        from impresso_ta.streaming.sessions import _parse_gap_us

        ttl_ms = _parse_gap_us(tombstone_ttl) // 1000
        cols.append(f"CAST({ts_col} AS TIMESTAMP) AS ts")
        # epoch millis as a LONG, computed JVM-side: timezone-immune
        # (the ts TIMESTAMP itself is still selected for the watermark)
        cols.append(f"unix_millis(CAST({ts_col} AS TIMESTAMP)) AS ts_ms")
    selected = (
        log.selectExpr(*cols)
        # a NULL key or seq (including non-numeric values the CAST nulls
        # out) would be a poison pill: int(NaN) fails the task, the
        # checkpoint replays the row, and the stream wedges forever.
        # Drop them here; route malformed CDC records to an error
        # channel UPSTREAM if they must be kept (S15 convention).
        .where("key IS NOT NULL AND seq IS NOT NULL")
    )
    if ttl_ms is not None:
        selected = selected.where("ts IS NOT NULL").withWatermark(
            "ts", tombstone_ttl
        )
    return selected.groupBy("key").applyInPandasWithState(
        _cdc_fn(delete_value, has_op=op_col is not None, ttl_ms=ttl_ms),
        outputStructType=CDC_UPSERT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
