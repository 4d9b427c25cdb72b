"""Structured Streaming ingestion tests: exactly-once staging with
arrival-order docIDs, watermarked windows, and compaction to a queryable
block index."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from websearchengine_spark.streaming import ingest


def _write_wave(spark, src_dir, conv_prefix, n_convs, ts_base):
    rows = [
        (f"{conv_prefix}{c}", t, "user", f"wave {conv_prefix} conv {c} turn {t} text body",
         None, ts_base + dt.timedelta(seconds=60 * t))
        for c in range(n_convs)
        for t in range(3)
    ]
    df = spark.createDataFrame(rows, ingest.TRANSCRIPT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(src_dir)


def test_staging_exactly_once_and_arrival_ids(spark, tmp_path):
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    _write_wave(spark, src, "a", 4, base)
    q = ingest.stage_stream(ingest.stream_transcripts(spark, src), staging, ckpt)
    q.awaitTermination(120)
    staged1 = ingest.read_staged(spark, staging)
    assert staged1.count() == 12
    ids1 = sorted(r["doc_id"] for r in staged1.collect())
    assert ids1 == list(range(12))  # dense arrival-order ids

    # wave 2 arrives; only NEW files are processed (checkpoint), ids continue
    _write_wave(spark, src, "b", 2, base + dt.timedelta(minutes=10))
    q = ingest.stage_stream(ingest.stream_transcripts(spark, src), staging, ckpt)
    q.awaitTermination(120)
    staged2 = ingest.read_staged(spark, staging)
    assert staged2.count() == 18
    ids2 = sorted(r["doc_id"] for r in staged2.collect())
    assert ids2 == list(range(18))
    # wave-1 rows keep their ids (append-only staging)
    a_ids = {r["doc_id"] for r in staged2.filter(F.col("conv_id").startswith("a")).collect()}
    assert a_ids == set(range(12))

    # re-running with nothing new is a no-op (exactly-once)
    q = ingest.stage_stream(ingest.stream_transcripts(spark, src), staging, ckpt)
    q.awaitTermination(120)
    assert ingest.read_staged(spark, staging).count() == 18

    # batch lineage metadata
    meta = spark.read.parquet(os.path.join(staging, "_batch_meta"))
    rows = {r["batch_id"]: (r["n_turns"], r["id_lo"], r["id_hi"]) for r in meta.collect()}
    assert rows[0] == (12, 0, 11) and rows[1] == (6, 12, 17)

    # compaction → queryable index
    from websearchengine_spark.operators.wand import BlockIndexReader

    idx = str(tmp_path / "idx")
    m = ingest.compact(spark, staging, idx, resume=False, n_buckets=4, num_partitions=4)
    assert m.n_docs == 18
    hits = BlockIndexReader(idx).search("wave text", conjunctive=True, k=30)
    assert len(hits) == 18  # every turn contains both terms


def test_turn_rate_watermarked_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    base = dt.datetime(2026, 1, 1, 9, 0, 0)
    # two waves = two files = two micro-batches (maxFilesPerTrigger=1); the
    # watermark advances between them, closing wave-1's windows so append
    # mode emits them; wave-2's windows stay open in state
    _write_wave(spark, src, "x", 2, base)
    _write_wave(spark, src, "y", 1, base + dt.timedelta(hours=1))

    out = (
        ingest.turn_rate(
            ingest.stream_transcripts(spark, src, max_files_per_trigger=1),
            "1 minute", "30 seconds",
        )
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")          # append emits only watermark-closed windows
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    out.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates ORDER BY window_start").collect()
    got = {(r["window_start"].hour, r["window_start"].minute): r["n_turns"] for r in rows}
    # wave 1: 2 convs × turns at +0/+60/+120s → 2 turns in each of 9:00/9:01/9:02
    assert got.get((9, 0)) == 2 and got.get((9, 1)) == 2 and got.get((9, 2)) == 2
    # the final 10:02 window ends after the last watermark (10:01:30) and
    # must remain open in state — append mode never emits it
    assert (10, 2) not in got


EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_user_sessions_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer (streaming/sessions.py): replayed
    event files → the SAME sessions as the batch operator
    pipeline/events.user_sessions, including a session that EXTENDS across
    a micro-batch boundary (state carry), one closed by an in-batch gap,
    and one closed by the event-time timeout (watermark)."""
    import time as _time

    from websearchengine_spark.pipeline.events import user_sessions
    from websearchengine_spark.streaming.sessions import stream_user_sessions

    src = str(tmp_path / "esrc")
    os.makedirs(src)
    base = dt.datetime(2026, 1, 1, 9, 0, 0)

    def ev(eid, minutes, user, day=0):
        return (
            eid,
            base + dt.timedelta(days=day, minutes=minutes),
            user,
            "click",
            1.0,
            None,
        )

    waves = [
        # b0: user 1 opens a session (3 events), user 2 opens one
        [ev(0, 0, 1), ev(1, 5, 1), ev(2, 10, 1), ev(3, 0, 2)],
        # b1: user 1's 9:20 EXTENDS session 0 across the batch boundary,
        # 10:00 gap-closes it (gap 30 min) and opens session 1; user 3
        # appears; the watermark after b1 passes user 2's timeout
        [ev(4, 20, 1), ev(5, 60, 1), ev(6, 60, 3)],
        # b2: far-future sentinel — advances the watermark a day, so b3
        # (sentinel 2) fires the timeouts for user 1's session 1 + user 3.
        # User 2's session 0 times out DURING b2 (no user-2 data here).
        [ev(7, 0, 98, day=1)],
        # b3: user 2 RETURNS after its timeout — the tombstone must carry
        # the session counter, so this is session 1, not a duplicate
        # (2, 0); the 2-hour in-batch gap closes it deterministically
        [ev(8, 0, 99, day=2), ev(9, 0, 2, day=1), ev(10, 120, 2, day=1)],
    ]
    import glob
    import shutil

    for i, rows in enumerate(waves):
        tmp = str(tmp_path / f"wave_tmp_{i}")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        # flat FILE per wave (the stream source ignores nested dirs), with
        # forced modification times — the file source orders batches by them
        dst = os.path.join(src, f"wave_{i}.parquet")
        shutil.copy(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        t = _time.time() + i * 10
        os.utime(dst, (t, t))

    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_user_sessions(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["n_events"], r["closed_by"]
        )
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch twin over the real users' events (sentinels excluded)
    events = spark.createDataFrame(
        [e for w in waves[:2] for e in w], EVENT_SCHEMA
    )
    exp = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["n_events"]
        )
        for r in user_sessions(events, gap_minutes=30).collect()
    }
    # every batch session is emitted exactly once; values identical
    # (sentinel 98's session may also flush — availableNow runs a final
    # watermark-advance batch — but 99's never can: nothing outlives it)
    assert set(exp) <= set(got)
    # (2, 1) = user 2's post-timeout return; (2, 2) and (98, 0) may also
    # flush in availableNow's final watermark-advance batch
    assert set(got) - set(exp) <= {(98, 0), (2, 1), (2, 2)}
    for key in exp:
        start, end, n, _by = got[key]
        assert (start, end, n) == exp[key], key
    # the boundary-crossing session really carried state (4 events: 3 from
    # b0 + 1 from b1) and closed by GAP; the idle users closed by TIMEOUT
    assert got[(1, 0)][2] == 4 and got[(1, 0)][3] == "gap"
    assert got[(2, 0)][3] == "timeout"
    assert got[(3, 0)][3] == "timeout"
    assert (99, 0) not in got
    # REGRESSION (session counter survives timeout): user 2 returned after
    # its session-0 timeout; the tombstone state must number the new
    # session 1 — the pre-fix code removed state on timeout, restarting at
    # 0 and silently overwriting the (2, 0) key with conflicting values
    day1 = base + dt.timedelta(days=1)
    assert got[(2, 1)] == (day1, day1, 1, "gap")


def test_batch_replay_is_idempotent(spark, tmp_path):
    """A micro-batch that crashed after its meta write but before the
    checkpoint commit is REPLAYED by Structured Streaming with the same
    batch_id: the writer must reuse the recorded id_lo (stable doc_ids, no
    id-space gap) and leave exactly one meta row per batch."""
    staging = str(tmp_path / "staging")
    writer = ingest.make_batch_writer(staging)
    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def wave(prefix, n):
        rows = [
            (f"{prefix}{c}", t, "user", f"{prefix} body {c} {t}", None,
             base + dt.timedelta(seconds=t))
            for c in range(n) for t in range(2)
        ]
        return spark.createDataFrame(rows, ingest.TRANSCRIPT_SCHEMA)

    writer(wave("a", 3), 0)        # 6 turns → ids 0..5
    writer(wave("b", 2), 1)        # 4 turns → ids 6..9
    before = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in ingest.read_staged(spark, staging).collect()
    }
    writer(wave("b", 2), 1)        # REPLAY of batch 1 (same writer state)
    # a restarted stream (fresh writer → meta re-read) replaying batch 1:
    ingest.make_batch_writer(staging)(wave("b", 2), 1)
    after = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in ingest.read_staged(spark, staging).collect()
    }
    assert after == before  # same rows, same ids — byte-stable staging
    meta = spark.read.parquet(os.path.join(staging, "_batch_meta"))
    rows = {int(r["batch_id"]): (r["n_turns"], r["id_lo"], r["id_hi"])
            for r in meta.collect()}
    assert rows == {0: (6, 0, 5), 1: (4, 6, 9)}  # one row per batch, no dups

    # the NEXT new batch continues densely after the replay
    ingest.make_batch_writer(staging)(wave("c", 1), 2)
    ids = sorted(r["doc_id"] for r in ingest.read_staged(spark, staging).collect())
    assert ids == list(range(12))
