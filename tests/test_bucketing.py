"""Bucketed co-located joins: the write-once/join-many layout contract
(plans/bucketing.py) actually removes the join shuffle, and bucket
pruning actually narrows the scan — pinned on physical plans."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clara_ocr_spark.plans.bucketing import (
    explain_str,
    colocated_join,
    n_exchanges,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # a bare filter doesn't trigger bucketed reading on its own
    # (autoBucketedScan turns it off when no join/agg uses the
    # bucketing); force it so bucket PRUNING is observable
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )


def test_bucketed_join_no_exchange_and_prunes(spark, tmp_path, no_broadcast):
    spark.sql(
        f"create database if not exists bdb location '{tmp_path}/warehouse'"
    )
    try:
        blocks = spark.range(2000).select(
            F.concat(F.lit("h"), (F.col("id") % 40).cast("string")).alias(
                "host"
            ),
            F.col("id").alias("block_id"),
        )
        pats = spark.range(400).select(
            F.concat(F.lit("h"), (F.col("id") % 40).cast("string")).alias(
                "host"
            ),
            F.concat(F.lit("fp"), F.col("id").cast("string")).alias(
                "fingerprint"
            ),
        )
        write_bucketed(blocks, "bdb.blocks_b", "host", 8)
        write_bucketed(pats, "bdb.pats_b", "host", 8)

        j = colocated_join(spark, "bdb.blocks_b", "bdb.pats_b", "host")
        n = j.count()
        assert n == 2000 * 10  # 50 blocks × 10 patterns per host
        assert n_exchanges(j) == 0  # co-located: no shuffle on either side

        # control: the same join from non-bucketed sources must shuffle
        c = blocks.join(pats, "host")
        assert c.count() == n
        assert n_exchanges(c) >= 1

        # bucket pruning: an equality filter on the bucket key reads a
        # strict subset of buckets (plan advertises the selection)
        p = spark.table("bdb.blocks_b").filter(F.col("host") == "h3")
        assert p.count() == 50
        plan = explain_str(p)
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.sql("drop database if exists bdb cascade")
