"""The four comparison engines (classify meta-operator, SURVEY §2.8):
contract, determinism, and per-engine semantics."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from clara_ocr_spark.pipeline import read_pages
from clara_ocr_spark.stages.classify import classify
from clara_ocr_spark.stages.engines import (
    ENGINES,
    classify_scored,
    pattern_features,
)
from clara_ocr_spark.stages.segment import segment


@pytest.fixture(scope="module")
def blocks(spark, corpus_path):
    return segment(read_pages(spark, corpus_path)).localCheckpoint()


@pytest.fixture(scope="module")
def patterns(spark, blocks):
    return pattern_features(classify(blocks)).localCheckpoint()


@pytest.mark.parametrize("engine", ENGINES)
def test_engine_contract(spark, blocks, engine, patterns):
    out = classify_scored(blocks, patterns, engine=engine)
    rows = out.filter(F.col("pos") >= 0).select("match_score", "match_grade").collect()
    assert rows, "no scored rows"
    assert all(r.match_score is None or 0.0 <= r.match_score <= 10.0 for r in rows)
    grades = {r.match_grade for r in rows}
    assert grades <= {None, "strong", "weak"}


def test_engine_deterministic(spark, blocks, patterns):
    a = classify_scored(blocks, patterns, engine="skel")
    b = classify_scored(blocks, patterns, engine="skel")
    key = ["url", "pos", "best_fingerprint", "match_score", "pattern_label"]
    assert sorted(map(tuple, a.select(key).collect())) == sorted(
        map(tuple, b.select(key).collect())
    )


def test_exact_fingerprint_scores_ten(spark, blocks, patterns):
    """A block whose tag_path IS a library fingerprint must score 10
    under the set-based engines (containment and graded Jaccard)."""
    fps = {r.fingerprint for r in patterns.collect()}
    for engine in ("skel", "pd"):
        out = classify_scored(blocks, patterns, engine=engine)
        exact = out.filter(
            (F.col("pos") >= 0) & F.col("tag_path").isin(list(fps))
        ).collect()
        assert exact
        assert all(r.match_score == 10.0 for r in exact), engine


def test_map_engine_prefers_closer_features(spark):
    """Hand-built case: under the border-mapping engine the pattern
    with the closer feature vector must win the election."""
    from clara_ocr_spark.stages.segment import BLOCKS_SCHEMA

    block = spark.createDataFrame(
        [("u", 0, 0, "body/div/p", 3, "text", 40, 0, 1, 0.10, 0.05, 0.30, 8)],
        BLOCKS_SCHEMA,
    )
    pats = spark.createDataFrame(
        [
            ("x/p", "content", 5, 0.12, 0.06, 0.28, 40.0),   # close
            ("y/p", "boilerplate", 5, 0.90, 0.50, 0.01, 40.0),  # far
        ],
        "fingerprint string, label string, matches bigint, "
        "p_link_density double, p_punct_ratio double, "
        "p_stopword_ratio double, p_text_len double",
    )
    r = classify_scored(block, pats, engine="map").collect()[0]
    assert r.best_fingerprint == "x/p"
    assert r.pattern_label == "content"  # close match is strong (≥8)

    r2 = classify_scored(block, pats, engine="shape").collect()[0]
    assert r2.match_score == 10.0  # text_len 40 vs p_text_len 40


def test_unknown_engine_rejected(spark, blocks, patterns):
    with pytest.raises(ValueError, match="selbc"):
        classify_scored(blocks, patterns, engine="nope")


def test_extract_with_engine_end_to_end(spark, corpus_path, patterns):
    """The scored-engine pipeline variant runs end to end and yields a
    text for every url (sentinel contract preserved)."""
    from clara_ocr_spark.pipeline import extract, read_pages

    pages = read_pages(spark, corpus_path)
    out = extract(pages, patterns=patterns, engine="skel")
    n_pages = pages.count()
    rows = out.collect()
    assert len(rows) == n_pages
    assert {r.url for r in rows} == {r.url for r in pages.select("url").collect()}
