"""Every registry query must match its DuckDB oracle at sf0.001
(fast) — the driver runs the same contract at sf0.01."""

from __future__ import annotations

import pytest

from clara_ocr_spark.oracle import compare, duck_connect
from clara_ocr_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def duck(sf001):
    con = duck_connect(sf001)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf001, duck, name):
    fn, sql = REGISTRY[name]
    if sql is None:
        assert fn(spark, sf001).count() >= 0
        return
    compare(spark, sf001, fn, sql, con=duck)
