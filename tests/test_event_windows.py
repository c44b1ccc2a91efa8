"""Event-time windowing: batch/streaming parity + watermark late-drop.

The batch query (windowed_event_counts) is the oracle for the
streaming form (stream_windowed_counts): complete-mode AvailableNow
over the same files must produce the identical rollup, and in append
mode a row arriving more than the watermark delay behind the observed
max event time must be dropped from its (already finalized) window.
"""

import datetime as dt

import pytest

from ferenda_spark.streaming.windows import (
    sessionize, stream_windowed_counts, windowed_event_counts)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, float(v), "{}")
         for i, (ts, uid, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _d(days, hours=0, minutes=0, seconds=0):
    return T0 + dt.timedelta(days=days, hours=hours,
                             minutes=minutes, seconds=seconds)


def test_stream_complete_equals_batch(spark, tmp_path):
    rows = [(_d(0, h), h % 3, "view" if h % 2 else "click", h)
            for h in range(24)] + \
           [(_d(2, h), h % 5, "purchase", 10 * h) for h in range(12)]
    events = _mk_events(spark, rows)
    src = str(tmp_path / "events_src")
    events.repartition(3).write.parquet(src)

    got = stream_windowed_counts(
        spark, src, str(tmp_path / "ckpt"),
        table="t_stream_parity").orderBy("window_start", "event_type")
    want = windowed_event_counts(spark.read.parquet(src))
    assert [r.asDict() for r in got.collect()] == \
           [r.asDict() for r in want.collect()]


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    import os
    src = str(tmp_path / "events_late")
    os.makedirs(src)
    # file1 (micro-batch 0): three on-time day-0 events.
    f1 = _mk_events(spark, [(_d(0, 1), 1, "view", 1.0),
                            (_d(0, 2), 1, "view", 1.0),
                            (_d(0, 3), 2, "view", 1.0)])
    # file2 (micro-batch 1): a day-9 event — advances the watermark to
    # day 8 at batch end, finalizing the day-0 window.
    f2 = _mk_events(spark, [(_d(9, 0), 3, "view", 1.0)])
    # file3 (micro-batch 2): filler on-time event. Needed because
    # state EVICTION uses the current batch's watermark but the
    # late-row FILTER uses the previous batch's (observed on this
    # Spark build: batch N drops input older than the wm computed
    # after batch N-2, evicts state with the wm after batch N-1) —
    # the day-0 window is emitted (n=3) and evicted in THIS batch.
    f3 = _mk_events(spark, [(_d(9, 6), 3, "view", 1.0)])
    # file4 (micro-batch 3): one LATE day-0 event — 9 days behind the
    # max event time, far beyond the 1-day watermark delay → dropped
    # (numRowsDroppedByWatermark=1), never re-opens the day-0 window.
    f4 = _mk_events(spark, [(_d(0, 4), 2, "view", 1.0)])
    f1.coalesce(1).write.parquet(src + "/f1")
    f2.coalesce(1).write.parquet(src + "/f2")
    f3.coalesce(1).write.parquet(src + "/f3")
    f4.coalesce(1).write.parquet(src + "/f4")
    # order micro-batches by file modification time (oldest first)
    now = dt.datetime.now().timestamp()
    for i, sub in enumerate(("f1", "f2", "f3", "f4")):
        d = os.path.join(src, sub)
        mtime = now - (3 - i) * 60
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (mtime, mtime))

    got = stream_windowed_counts(
        spark, src + "/*", str(tmp_path / "ckpt_late"),
        append_path=str(tmp_path / "out_late"))
    day0 = {r.window_start: r.n_events for r in got.collect()}
    # the day-0 window was finalized by the watermark before the late
    # row arrived: it counts only the 3 on-time events
    assert day0.get("2024-03-01 00:00:00") == 3
    # the batch rollup over ALL files (no watermark) counts 4 — the
    # streaming path demonstrably dropped the late row
    batch = windowed_event_counts(spark.read.parquet(src + "/*"))
    batch_day0 = {r.window_start: r.n_events for r in batch.collect()}
    assert batch_day0["2024-03-01 00:00:00"] == 4


def test_sessionize_gap_semantics(spark):
    # user 1: three events 10 min apart (one session), then one 31 min
    # later (new session); user 2: single event
    rows = [(_d(0, 0, 0), 1, "view", 1.0),
            (_d(0, 0, 10), 1, "view", 1.0),
            (_d(0, 0, 20), 1, "click", 1.0),
            (_d(0, 0, 51), 1, "view", 1.0),
            (_d(0, 5, 0), 2, "view", 1.0)]
    out = sessionize(_mk_events(spark, rows)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert [s.n_events for s in by_user[1]] == [3, 1]
    assert by_user[1][0].duration_us == 20 * 60 * 1_000_000
    # boundary: exactly 30:00 gap starts a NEW session (>= gap rule,
    # matching session_window's merge-iff-strictly-inside semantics)
    rows_b = [(_d(0, 0, 0), 7, "view", 1.0),
              (_d(0, 0, 30), 7, "view", 1.0)]
    out_b = sessionize(_mk_events(spark, rows_b)).collect()
    assert [r.n_events for r in out_b] == [1, 1]
    assert len(by_user[2]) == 1
