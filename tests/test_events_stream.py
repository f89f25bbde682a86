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
