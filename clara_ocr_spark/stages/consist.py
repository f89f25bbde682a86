"""Stage G — consistency checks + per-partition lineage metrics.

≈ Clara step_6 ``cons()`` (clara.c:2888-2905; consist.c:33-60): every
structural invariant is checked as a pipeline stage and a violation is
fatal.  Here the invariants are DataFrame predicates aggregated to
violation counts — one pass, no collect of row data.

Lineage (north_rule): every stage can emit a per-partition metrics
row set ``(run_id, stage, partition_id, n_rows)`` plus per-stage
row-count totals, appended to a parquet metrics table — the analogue
of Clara's per-page ``dl_*`` stats arrays (common.h:1493-1498).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: invariant name → violation predicate (≈ cl_cons/s_cons rules)
BLOCK_INVARIANTS = {
    "pos_not_null": "pos is null",
    "zone_negative": "zone < 0",
    "text_len_mismatch": "pos >= 0 and text_len != length(text)",
    "link_len_exceeds": "pos >= 0 and link_text_len > text_len",
    "bad_label": "label not in ('content','boilerplate','noise')",
    "score_range": "score < 0 or score > 10",
    "sentinel_shape": "pos = -1 and (text != '' or tag_path != '')",
}


def check_blocks(blocks: DataFrame) -> DataFrame:
    """One row per invariant with its violation count (0 = healthy)."""
    aggs = [
        # coalesce: sum over ZERO rows is null (empty incremental
        # delta must read as 0 violations, not crash the gate)
        F.coalesce(F.sum(F.when(F.expr(pred), 1).otherwise(0)), F.lit(0)).alias(
            name
        )
        for name, pred in BLOCK_INVARIANTS.items()
    ]
    wide = blocks.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in BLOCK_INVARIANTS)
    return wide.selectExpr(
        f"stack({len(BLOCK_INVARIANTS)}, {stack}) as (invariant, violations)"
    )


def assert_consistent(blocks: DataFrame) -> None:
    """Fatal on any violation — the step_6 contract."""
    bad = [r for r in check_blocks(blocks).collect() if r.violations > 0]
    if bad:
        raise AssertionError(
            "consistency violations: "
            + ", ".join(f"{r.invariant}={r.violations}" for r in bad)
        )


def partition_lineage(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition row counts for a stage (skew visibility: a hot
    host shows up as one fat partition here before it hurts)."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "n_rows",
            F.current_timestamp().alias("recorded_at"),
        )
    )


def append_metrics(metrics: DataFrame, path: str) -> None:
    metrics.write.mode("append").parquet(path)
