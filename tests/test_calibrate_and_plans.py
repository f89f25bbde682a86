"""Salted calibration correctness + physical-plan shape assertions
(the .explain checks: pushdown, broadcast, single-shuffle pipeline)."""

from __future__ import annotations

import pyspark.sql.functions as F

from clara_ocr_spark.pipeline import extract, read_pages
from clara_ocr_spark.queries import REGISTRY
from clara_ocr_spark.stages.calibrate import (
    calibrate_hosts,
    calibrate_hosts_unsalted,
    with_salt,
)
from clara_ocr_spark.stages.classify import classify
from clara_ocr_spark.stages.segment import segment, with_host


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_equals_unsalted(spark, corpus_path):
    pages = read_pages(spark, corpus_path)
    blocks = with_host(classify(segment(pages)))
    a = {
        r.host: (r.n_blocks, round(r.avg_link_density, 9), round(r.avg_text_len, 9), r.max_text_len)
        for r in calibrate_hosts(blocks).collect()
    }
    b = {
        r.host: (r.n_blocks, round(r.avg_link_density, 9), round(r.avg_text_len, 9), r.max_text_len)
        for r in calibrate_hosts_unsalted(blocks).collect()
    }
    assert a == b
    # the Zipf skew is real: hottest host ≫ median host
    counts = sorted(v[0] for v in a.values())
    assert counts[-1] > 5 * counts[len(counts) // 2]


def test_salt_deterministic(spark, corpus_path):
    pages = read_pages(spark, corpus_path)
    s1 = with_salt(pages.select("url")).collect()
    s2 = with_salt(pages.select("url")).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    n_salts = len({r.salt for r in s1})
    assert n_salts > 8  # actually spreads


# -- plan-shape assertions (SURVEY: iterate on .explain output) ---------


def test_filter_pushdown_to_parquet(spark, sf001):
    fn, _ = REGISTRY["range_filter"]
    plan = _plan(fn(spark, sf001))
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:300]


def test_column_pruning(spark, sf001):
    fn, _ = REGISTRY["top_sources_by_chars"]
    plan = _plan(fn(spark, sf001))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "source" in read_schema and "n_chars" in read_schema
    assert "text" not in read_schema  # big column not read


def test_broadcast_join_used(spark, sf001):
    fn, _ = REGISTRY["broadcast_classify"]
    plan = _plan(fn(spark, sf001))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pattern_join_is_broadcast(spark, corpus_path):
    pages = read_pages(spark, corpus_path)
    pats = pages.sparkSession.createDataFrame(
        [("html/body/nav", "boilerplate", 0)], "fingerprint string, label string, matches bigint"
    )
    plan = _plan(extract(pages, pats))
    assert "BroadcastHashJoin" in plan


def test_extraction_single_shuffle(spark, corpus_path):
    """The extraction pipeline must have exactly one exchange (the
    per-url assembly aggregate) — no hidden repartitions or joins."""
    pages = read_pages(spark, corpus_path)
    plan = _plan(extract(pages))
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges == 1, plan


def test_extraction_html_pruned_from_shuffle(spark, corpus_path):
    """html bytes must not travel through the shuffle: the projection
    feeding the assembly aggregate carries only (url, zone, pos, text),
    and the aggregate does a map-side partial collect before the
    exchange."""
    pages = read_pages(spark, corpus_path)
    plan = _plan(extract(pages))
    shuffle_part = plan.split("Exchange ")[1]
    project_line = next(
        ln for ln in shuffle_part.splitlines() if "Project [" in ln
    )
    assert "html" not in project_line and "tag_path" not in project_line
    assert "partial_collect_list" in shuffle_part  # map-side partial agg


def test_whole_stage_codegen_in_queries(spark, sf001):
    fn, _ = REGISTRY["pricing_summary"]
    df = fn(spark, sf001)
    df.collect()  # materialize the AQE final plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark whole-stage-codegen'd operators in AQE plans
    assert "*(" in plan
    assert "partial_sum" in plan  # map-side partial aggregation


def test_revenue_join_plan_shape(spark, sf001):
    """Q5 shape: dims broadcast, region filter pushed to scan, no
    cartesian/nested-loop join anywhere."""
    df = REGISTRY["revenue_by_nation"][0](spark, sf001)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan  # pushed to the region scan


def test_near_dup_plan_no_or_join(spark, sf001):
    """The LSH OR-construction must compile to two equi hash joins —
    an OR join condition would be a nested-loop scan of all pairs."""
    df = REGISTRY["near_dup_cosine"][0](spark, sf001)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_plan_shape(spark, sf001):
    """Centroid table must broadcast; the only cross join allowed is
    the 10-row centroid assignment (broadcast NLJ), never a pair scan."""
    df = REGISTRY["ivf_topk"][0](spark, sf001)
    plan = _plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
