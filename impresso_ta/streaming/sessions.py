"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState`` (SURVEY §2.9 extension).

The batch engine already has 30-min session windows (``session_window``,
oracle ``events_sessionize``). This is the continuous twin for feeds the
batch form can't serve: sessions that STAY OPEN across micro-batches are
held in the state store (per-user, fault-tolerant via checkpoint) and
emitted exactly once when they close — either because a later event for
the same user arrives past the gap ("gap"), or because the event-time
watermark passes the open session's deadline with no new data
("timeout").

Scale posture: state is O(active users), one tiny tuple each; the only
shuffle is the groupBy on ``user_id`` that Structured Streaming needs to
co-locate a key's state with its events — the same shuffle the batch
``session_window`` aggregation pays.
"""

from __future__ import annotations

import datetime
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed_by", StringType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

_US = 1_000_000

_GAP_UNITS = {"second": 1, "minute": 60, "hour": 3600}


def _parse_gap_us(gap: str) -> int:
    """'<int> second[s]|minute[s]|hour[s]' -> microseconds, or a
    ValueError naming the accepted format (a bare KeyError on '1 day'
    or '90 sec' told the caller nothing)."""
    parts = gap.split()
    if (
        len(parts) != 2
        or not parts[0].isdigit()
        or int(parts[0]) <= 0
        or parts[1].rstrip("s") not in _GAP_UNITS
    ):
        # int() > 0 also rejects '0 seconds' — a degenerate gap that
        # would silently make every event its own session/debounce
        # anchor instead of failing loudly like the malformed formats
        raise ValueError(
            f"gap {gap!r}: expected '<positive int> "
            "second[s]|minute[s]|hour[s]' (e.g. '30 seconds', '1 hour')"
        )
    return int(parts[0]) * _GAP_UNITS[parts[1].rstrip("s")] * _US


def _ts(us: int) -> datetime.datetime:
    return datetime.datetime.fromtimestamp(us / _US, tz=datetime.timezone.utc).replace(
        tzinfo=None
    )


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[dict[str, Any]] = []

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": _ts(start_us),
                    "session_end": _ts(last_us),
                    "n_events": n,
                    "closed_by": "timeout",
                }
            )
            state.remove()
        else:
            cur = state.get if state.exists else None
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(v) // 1000 for v in pdf["ts"].astype("int64").tolist()
                )
            ts_us.sort()
            for t in ts_us:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
                else:
                    closed.append(
                        {
                            "user_id": user_id,
                            "session_start": _ts(cur[0]),
                            "session_end": _ts(cur[1]),
                            "n_events": cur[2],
                            "closed_by": "gap",
                        }
                    )
                    cur = (t, t, 1)
            if cur is not None:
                state.update(cur)
                # close the open session if no event arrives before
                # watermark > last_ts + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA])

    return fn


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 second",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows with explicit cross-batch state.

    ``events`` is a streaming DataFrame with at least (user_col, ts_col).
    Emits one row per CLOSED session; `closed_by` says whether a later
    event closed it ("gap") or the watermark did ("timeout"). Gap-closed
    sessions match the batch ``session_window`` result exactly (tested).
    """
    gap_us = _parse_gap_us(gap)
    return (
        events.selectExpr(
            f"CAST({user_col} AS LONG) AS user_id", f"{ts_col} AS ts"
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("doc_id", LongType()),
    ]
)

_DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (fingerprint,) = key
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    first: int | None = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        first = m if first is None else min(first, m)
    if first is None:
        return
    state.update((1,))
    yield pd.DataFrame(
        [{"fingerprint": fingerprint, "doc_id": first}],
        columns=["fingerprint", "doc_id"],
    )


def stream_dedup_first_seen(
    docs: DataFrame,
    fingerprint_col: str = "fingerprint",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: emit each content fingerprint ONCE — the
    first time it is seen across all micro-batches — with the smallest
    doc id of the batch that introduced it.

    The streaming twin of ``dedup.exact_dedup_groups`` and of the
    reference's incremental skip (F3 anti-join, ref:
    generic_importer.py:240-249): the state store IS the
    already-imported set, so re-feeding the same files emits nothing,
    without re-reading any output table. State is one tombstone row per
    distinct fingerprint; at 100 TB scope it with a TTL or periodic
    state compaction.
    """
    return (
        docs.selectExpr(
            f"{fingerprint_col} AS fingerprint",
            f"CAST({id_col} AS LONG) AS doc_id",
        )
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_DEBOUNCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

# state: last KEPT event time (chained suppression anchor)
_DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_kept_us", LongType())])


def _debounce_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle past the gap: any future event is kept regardless, so
            # the anchor is dead weight — GC it (state stays O(ACTIVE keys))
            state.remove()
            return
        rows: list[tuple[int, int]] = []  # (ts_us, event_id)
        for pdf in pdfs:
            rows.extend(
                zip(
                    (int(v) // 1000 for v in pdf["ts"].astype("int64")),
                    (int(v) for v in pdf["event_id"]),
                )
            )
        rows.sort()  # (ts, event_id): deterministic tie-break
        last = state.get[0] if state.exists else None
        kept: list[dict] = []
        for t, eid in rows:
            if last is None or t - last > gap_us:
                kept.append(
                    {"user_id": user_id, "event_id": eid, "ts": _ts(t)}
                )
                last = t
        if last is not None:
            state.update((last,))
            state.setTimeoutTimestamp((last + gap_us) // 1000 + 1000)
        if kept:
            yield pd.DataFrame(
                kept, columns=[f.name for f in _DEBOUNCE_SCHEMA]
            )

    return fn


def stream_debounce(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "1 second",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming debounce with CHAINED suppression: an event is kept
    only if it arrives more than ``gap`` after the last KEPT event of
    its key — the running-state semantics the batch
    ``operators/windows.debounce`` docstring defers to streaming (the
    lag-based batch form judges against the immediate predecessor; the
    two agree whenever bursts are shorter than the gap).

    State is one BIGINT per ACTIVE key (the last-kept anchor), GC'd by
    event-time timeout once a key has been idle past the gap — at that
    point any future event would be kept regardless, so dropping the
    anchor cannot change results. Exactly the sessionize shuffle: one
    groupBy(user) to co-locate key state.
    """
    gap_us = _parse_gap_us(gap)
    return (
        events.selectExpr(
            f"CAST({user_col} AS LONG) AS user_id",
            f"CAST({id_col} AS LONG) AS event_id",
            f"{ts_col} AS ts",
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _debounce_fn(gap_us),
            outputStructType=_DEBOUNCE_SCHEMA,
            stateStructType=_DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
