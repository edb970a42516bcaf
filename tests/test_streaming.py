"""Structured Streaming ingest: watermarked dedup + partitioned sink with
availableNow trigger (the reference's scheduled-batch cadence, §2.9)."""

from __future__ import annotations

import json
import os

from nfl_data_engineering_spark.streaming.ingest import (deduped_stream,
                                                         read_event_stream,
                                                         windowed_counts_stream,
                                                         write_partitioned_stream)


def _write_events_json(path, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "batch.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENTS = [
    {"event_id": 1, "ts": "2024-01-10T00:00:00.000Z", "user_id": 7,
     "event_type": "click", "value": 1.5},
    {"event_id": 1, "ts": "2024-01-10T00:00:00.000Z", "user_id": 7,
     "event_type": "click", "value": 1.5},        # exact duplicate (double-run)
    {"event_id": 2, "ts": "2024-02-01T00:00:00.000Z", "user_id": 8,
     "event_type": "view", "value": 2.0},
]


def test_stream_dedup_and_partitioned_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_events_json(src, EVENTS)

    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    q = write_partitioned_stream(deduped_stream(stream, "2 days"), out, ckpt)
    q.awaitTermination(120)

    back = spark.read.parquet(out)
    assert back.count() == 2      # duplicate row collapsed
    assert os.path.isdir(os.path.join(out, "year=2024", "month=1"))
    assert os.path.isdir(os.path.join(out, "year=2024", "month=2"))

    # availableNow re-run over the same checkpoint is a no-op (exactly-once)
    q2 = write_partitioned_stream(deduped_stream(read_event_stream(spark, src),
                                                 "2 days"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_windowed_counts_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events_json(src, EVENTS)
    agg = windowed_counts_stream(read_event_stream(spark, src), "1 hour")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts").collect()
    got = {(r["event_type"]): r["n"] for r in rows}
    assert got == {"click": 2, "view": 1}  # complete mode counts pre-watermark
