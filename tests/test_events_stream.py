"""Streaming twins must agree with their batch equivalents.

Feed: sf0.001 events split into 3 time-ordered parquet shards (a
time-ordered feed, as an event log delivers); drain with availableNow.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from clara_ocr_spark.streaming.events_stream import (
    SESSION_GAP_S,
    drain_to_memory,
    read_events_stream,
    user_sessions_stateful,
    windowed_event_counts,
)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="module")
def events_dir(spark, sf001, tmp_path_factory):
    root = tmp_path_factory.mktemp("events_feed")
    ev = spark.read.parquet(f"{sf001}/events.parquet").orderBy("ts", "event_id")
    n = ev.count()
    rows = ev.collect()
    cut1, cut2 = n // 3, 2 * n // 3
    for i, chunk in enumerate((rows[:cut1], rows[cut1:cut2], rows[cut2:])):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(root / f"shard={i}")
        )
    # file source reads lexicographic dirs; shard=0..2 preserve time order
    return str(root)


def test_windowed_counts_match_batch(spark, sf001, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir + "/shard=*")
    got = drain_to_memory(
        spark,
        windowed_event_counts(stream),
        "win_counts",
        str(tmp_path / "ck1"),
        output_mode="append",
    )
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )
    # append mode emits only windows the final watermark passed
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = want.filter(
        F.col("win_start") < F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    got_rows = {tuple(r) for r in got.collect() if r.win_start < max_ts}
    want_rows = {tuple(r) for r in want.collect()}
    assert want_rows, "batch reference must be non-empty"
    assert want_rows <= got_rows, "stream missed closed windows"
    # and everything the stream emitted is correct vs batch
    full = {
        tuple(r)
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
        ).collect()
    }
    assert got_rows <= full, "stream emitted a window that disagrees with batch"


def test_stateful_sessions_match_batch(spark, sf001, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir + "/shard=*")
    got = drain_to_memory(
        spark,
        user_sessions_stateful(stream),
        "user_sessions",
        str(tmp_path / "ck2"),
        output_mode="update",
    )
    # update mode re-emits running totals; totals are monotone → final
    # state per user = max
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("n_sessions").alias("n_sessions")
    )
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    want = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("prev").cast("timestamp").cast("double")
                    > SESSION_GAP_S
                ),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("new_sess").alias("n_sessions"))
    )
    got_map = {r.user_id: (r.n_events, r.n_sessions) for r in final.collect()}
    want_map = {r.user_id: (r.n_events, r.n_sessions) for r in want.collect()}
    assert got_map == want_map


def test_recrawl_state_carries_across_drains(spark, tmp_path):
    """Two availableNow drains over a growing capture feed, one
    checkpoint: the second drain restores each url's last digest from
    the state store, so a capture whose predecessor arrived in the
    PREVIOUS drain still classifies correctly."""
    from clara_ocr_spark.streaming.events_stream import (
        recrawl_changes_stateful,
    )

    src, ck = tmp_path / "captures", str(tmp_path / "ck_rc")

    def feed(rows, shard):
        spark.createDataFrame(rows, "event_id long, url string, digest string") \
            .coalesce(1).write.parquet(str(src / f"shard={shard}"))

    # memory sinks cannot recover a checkpoint; foreachBatch can
    emitted = []

    def drain():
        q = (
            recrawl_changes_stateful(
                spark.readStream.schema(
                    "event_id long, url string, digest string"
                ).parquet(str(src) + "/shard=*")
            )
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed([(0, "u0", "da"), (1, "u0", "da"), (2, "u1", "dx")], 0)
    drain()
    # u0's next capture lands in a LATER drain; 'da' must still match
    feed([(3, "u0", "da"), (4, "u0", "db"), (5, "u1", "dx")], 1)
    drain()
    final = {}  # update mode: last emission per url wins
    for r in emitted:
        final[r.url] = (r.n_captures, r.n_unchanged, r.n_changed)
    assert final["u0"] == (4, 2, 1)  # cross-drain da==da counted
    assert final["u1"] == (2, 1, 0)


def test_streaming_dedup_drops_replays(spark, sf001, tmp_path):
    """Feed the same shard twice (an at-least-once source replay);
    the deduped stream must contain each event_id exactly once."""
    from clara_ocr_spark.streaming.events_stream import dedup_events

    src = tmp_path / "replay_feed"
    ev = spark.read.parquet(f"{sf001}/events.parquet").limit(500)
    ev.coalesce(1).write.parquet(str(src / "batch=0"))
    ev.coalesce(1).write.parquet(str(src / "batch=1"))  # the replay
    stream = read_events_stream(spark, str(src) + "/batch=*")
    got = drain_to_memory(
        spark,
        dedup_events(stream),
        "deduped_events",
        str(tmp_path / "ck3"),
        output_mode="append",
    )
    rows = got.collect()
    assert len(rows) == 500
    assert len({r.event_id for r in rows}) == 500


@pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState needs google.protobuf (not in this container)"
)
def test_transform_with_state_totals(spark, sf001, events_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) running
    totals must equal the batch groupBy at end of drain."""
    from clara_ocr_spark.streaming.events_stream import user_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_dir + "/shard=*")
        got = drain_to_memory(
            spark,
            user_totals_tws(stream),
            "user_totals_tws",
            str(tmp_path / "ck4"),
            output_mode="update",
        )
        final = got.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        ev = spark.read.parquet(f"{sf001}/events.parquet")
        want = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        got_map = {
            r.user_id: (r.n_events, round(r.total_value, 4))
            for r in final.collect()
        }
        want_map = {
            r.user_id: (r.n_events, round(r.total_value, 4))
            for r in want.collect()
        }
        assert got_map == want_map
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stateful_sessions_hot_key_skew(spark, tmp_path):
    """VERDICT r3 item 8: ~50% of all events on ONE user — the skew
    profile of a bot-heavy feed.  The stateful sessionizer must stay
    correct under the hot key (per-key state is one row regardless of
    event count), and update-mode output stays bounded by
    users x batches, never by events."""
    import datetime as dt

    from clara_ocr_spark.streaming.events_stream import EVENTS_SCHEMA

    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    # hot user 0: 6000 events 20s apart with a 2h jump every 1000
    t = base
    for i in range(6000):
        t += dt.timedelta(seconds=7200 if i and i % 1000 == 0 else 20)
        rows.append((eid, t, 0, "click", 1.0, None))
        eid += 1
    # cold users 1..60: 100 events each, 3600s apart (every event its
    # own session), phase-shifted per user
    for u in range(1, 61):
        for i in range(100):
            rows.append(
                (eid, base + dt.timedelta(seconds=u * 13 + i * 3600),
                 u, "click", 1.0, None)
            )
            eid += 1
    rows.sort(key=lambda r: (r[1], r[0]))
    n = len(rows)
    src = tmp_path / "skew_feed"
    ev = spark.createDataFrame(rows, EVENTS_SCHEMA)
    for i, (lo, hi) in enumerate(((0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n))):
        spark.createDataFrame(rows[lo:hi], EVENTS_SCHEMA).coalesce(
            1
        ).write.parquet(str(src / f"shard={i}"))

    stream = read_events_stream(spark, str(src) + "/shard=*")
    got = drain_to_memory(
        spark,
        user_sessions_stateful(stream),
        "skew_sessions",
        str(tmp_path / "ck_skew"),
        output_mode="update",
    )
    emitted = got.collect()
    # output bound: at most one running-total row per user per batch
    assert len(emitted) <= 61 * 3
    final = {}
    for r in emitted:
        cur = final.get(r.user_id, (0, 0))
        final[r.user_id] = (max(cur[0], r.n_events), max(cur[1], r.n_sessions))

    w = Window.partitionBy("user_id").orderBy("ts")
    want = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("double")
                    - F.col("prev").cast("double")
                    > SESSION_GAP_S
                ),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("new_sess").alias("n_sessions"))
    )
    want_map = {r.user_id: (r.n_events, r.n_sessions) for r in want.collect()}
    assert final == want_map
    assert final[0][0] == 6000  # the hot key really carried half


def test_streaming_dedup_state_bounded_by_watermark(spark, tmp_path):
    """VERDICT r3 item 8: dedup state must be EVICTED past the
    lateness horizon across a multi-batch drain — the scale-relevant
    property (unbounded state = OOM on a long-running stream) — while
    late replays beyond the watermark still emit nothing."""
    import datetime as dt

    from clara_ocr_spark.streaming.events_stream import (
        EVENTS_SCHEMA,
        dedup_events,
    )

    day = dt.datetime(2024, 5, 1)

    def mk(ids, t):
        return [(i, t, i % 7, "click", 1.0, None) for i in ids]

    batch_a = mk(range(0, 1000), day)  # hour 0
    batch_b = mk(range(1000, 2000), day + dt.timedelta(hours=6))
    batch_c = (
        mk(range(0, 1000), day)  # replay beyond watermark → late-drop
        + mk(range(1000, 2000), day + dt.timedelta(hours=6))  # in-state
        + mk(range(2000, 2100), day + dt.timedelta(hours=7))  # fresh
    )
    src = tmp_path / "late_feed"
    for name, batch in (("a", batch_a), ("b", batch_b), ("c", batch_c)):
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.parquet(
            str(src / f"shard={name}")
        )
    stream = read_events_stream(spark, str(src) + "/shard=*")
    q = (
        dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_state_bound")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.event_id for r in spark.table("dedup_state_bound").collect())
    assert ids == list(range(2100)), "exactly-once violated"
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no state-operator progress recorded"
    last_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    # batch A's 1000 ids (hour 0) are past the 1h watermark once the
    # stream has seen hour 6 — they must be gone from the store; only
    # batch B's 1000 + batch C's fresh 100 may remain
    assert last_state <= 1300, f"state not evicted: {last_state} rows"
    spark.catalog.dropTempView("dedup_state_bound")
