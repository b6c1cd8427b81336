"""Structured Streaming: windowed fetch metrics with AvailableNow rounds."""

from __future__ import annotations

import datetime as dt

from dataset_crawler_spark.streaming.stream import (
    FETCH_EVENT_SCHEMA,
    read_fetch_stream,
    run_available_now,
    windowed_host_metrics,
)


def test_windowed_metrics_available_now(spark, tmp_path):
    src = tmp_path / "fetch_events"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", "hostA", t0 + dt.timedelta(seconds=10), "success", 100),
        ("u2", "hostA", t0 + dt.timedelta(seconds=50), "error", 0),
        ("u3", "hostB", t0 + dt.timedelta(seconds=20), "success", 300),
        ("u4", "hostA", t0 + dt.timedelta(minutes=1, seconds=10), "success", 200),
        # late watermark flusher: an event far in the future closes old windows
        ("u5", "hostB", t0 + dt.timedelta(minutes=10), "success", 50),
    ]
    spark.createDataFrame(rows, FETCH_EVENT_SCHEMA).write.parquet(str(src))

    metrics = windowed_host_metrics(read_fetch_stream(spark, str(src)))
    run_available_now(metrics, str(out), str(ckpt))

    got = {
        (r.window_start.minute, r.host): (r.n_fetches, r.n_ok, r.total_bytes)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[(0, "hostA")] == (2, 1, 100)
    assert got[(0, "hostB")] == (1, 1, 300)
    assert got[(1, "hostA")] == (1, 1, 200)
