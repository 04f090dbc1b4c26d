"""Probe: streaming attribution-join STATE SIZE vs event rate,
watermark, and stream length (VERDICT r6 task 6).

The claim under test (streaming/joins.py docstring): per-key join state
is bounded by ``watermark + max_lag`` — state size tracks the event
RATE, not the stream's LIFETIME. Until now that was asserted, not
measured. This probe synthesizes an event stream as one json file per
10 event-time minutes (so the watermark advances between microbatches),
drains it through ``attribution_join`` with ``availableNow`` +
``maxFilesPerTrigger=1``, and records the PEAK
``stateOperators[].numRowsTotal`` across all microbatch progress
events.

Expected if the claim holds:
- 10x the events/minute  -> ~10x peak state rows (state ∝ rate)
- 6x the watermark       -> ~(watermark+lag)-proportional growth
- 4x the stream LENGTH at fixed rate -> ~flat peak state (eviction
  keeps only the trailing watermark+lag window alive)

Usage:  python tools/probe_stream_state.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impresso_ta.session import get_spark
from impresso_ta.streaming.joins import attribution_join

BASE_US = 1_700_000_000_000_000  # fixed epoch anchor (no wall clock)
FILE_MINUTES = 10  # one json file per 10 event-time minutes


def write_stream(src: str, minutes: int, per_minute: int) -> int:
    """One view+click pair per user per minute, ``per_minute`` users —
    both sides' watermarks advance together. Returns total events."""
    os.makedirs(src)
    n = 0
    for chunk_start in range(0, minutes, FILE_MINUTES):
        rows = []
        for m in range(chunk_start, min(chunk_start + FILE_MINUTES, minutes)):
            for u in range(per_minute):
                ts_us = BASE_US + m * 60_000_000 + u * 1_000
                for off, et in ((0, "view"), (500, "click")):
                    rows.append(
                        json.dumps(
                            {
                                "event_id": n,
                                "ts_us": ts_us + off,
                                "user_id": m * per_minute + u,
                                "event_type": et,
                            }
                        )
                    )
                    n += 1
        with open(os.path.join(src, f"chunk_{chunk_start:05d}.json"), "w") as f:
            f.write("\n".join(rows) + "\n")
    return n


def run_case(
    spark, minutes: int, per_minute: int, watermark: str, max_lag: str
) -> dict:
    work = tempfile.mkdtemp(prefix="stream_state_probe_")
    src = os.path.join(work, "events")
    try:
        n_events = write_stream(src, minutes, per_minute)
        stream = (
            spark.readStream.schema(
                "event_id long, ts_us long, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .selectExpr(
                "event_id",
                "timestamp_micros(ts_us) AS ts",
                "user_id",
                "event_type",
            )
        )
        joined = attribution_join(
            stream.filter("event_type = 'view'"),
            stream.filter("event_type = 'click'"),
            max_lag=max_lag,
            watermark=watermark,
        )
        q = (
            joined.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        peaks = [
            sum(op["numRowsTotal"] for op in p["stateOperators"])
            for p in (json.loads(str(j)) for j in q.recentProgress)
            if p.get("stateOperators")
        ]
        q.stop()
        return {
            "minutes": minutes,
            "events_per_minute": 2 * per_minute,
            "n_events": n_events,
            "watermark": watermark,
            "max_lag": max_lag,
            "n_batches": len(peaks),
            "peak_state_rows": max(peaks) if peaks else 0,
            "final_state_rows": peaks[-1] if peaks else 0,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        app_name="probe-stream-state",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    cases = [
        # rate sweep at fixed length + watermark: state ∝ rate?
        dict(minutes=120, per_minute=5, watermark="10 minutes",
             max_lag="30 minutes"),
        dict(minutes=120, per_minute=50, watermark="10 minutes",
             max_lag="30 minutes"),
        dict(minutes=120, per_minute=500, watermark="10 minutes",
             max_lag="30 minutes"),
        # watermark sweep at fixed rate: state ∝ watermark + lag?
        dict(minutes=120, per_minute=50, watermark="60 minutes",
             max_lag="30 minutes"),
        # length sweep at fixed rate: state must NOT track lifetime
        dict(minutes=480, per_minute=50, watermark="10 minutes",
             max_lag="30 minutes"),
    ]
    results = [run_case(spark, **c) for c in cases]
    for r in results:
        print(json.dumps(r))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
