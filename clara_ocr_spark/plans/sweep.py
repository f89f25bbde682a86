"""Parameter-sweep harness — the ``selthresh`` analogue.

selthresh (selthresh:361-430) sweeps the binarization threshold and
minimizes "bookfont size" (distinct untrained shape classes,
selthresh:163-194) — a self-supervised quality proxy needing no
labels.  The DOM analogue: sweep the rule-chain thresholds and
minimize the number of distinct tag-path classes that heuristics keep
as content but no pattern covers (plus coverage stats to avoid the
degenerate keep-nothing optimum).

Shape (SURVEY §3.3): param grid × blocks crossJoin (grid broadcast),
labels computed against grid COLUMNS instead of literals, ONE pass
over the blocks regardless of grid size, groupBy(cfg) aggregate.
"""

from __future__ import annotations

from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import ExtractConfig
from ..extract_rules import LABEL_BOILER, LABEL_CONTENT, LABEL_NOISE, NAV_COMPONENTS


def _grid_df(spark, grid: Iterable[ExtractConfig]) -> DataFrame:
    rows = [
        (i, c.min_text_len, c.link_density_max)
        for i, c in enumerate(grid)
    ]
    return spark.createDataFrame(
        rows, "cfg_id int, min_text_len int, link_density_max double"
    )


def sweep(blocks: DataFrame, grid: list[ExtractConfig]) -> DataFrame:
    """blocks × grid → per-config quality metrics.

    Returns (cfg_id, min_text_len, link_density_max,
    n_unmatched_classes  ← the bookfont-size analogue (minimize),
    n_content_blocks, total_content_chars ← coverage guards)."""
    spark = blocks.sparkSession
    grid_df = F.broadcast(_grid_df(spark, grid))
    real = blocks.filter(F.col("pos") >= 0)
    comps = F.split(F.col("tag_path"), "/")
    is_nav = F.arrays_overlap(
        comps, F.array(*[F.lit(c) for c in sorted(NAV_COMPONENTS)])
    )
    label = (
        F.when(F.col("pattern_label").isNotNull(), F.col("pattern_label"))
        .when(is_nav, F.lit(LABEL_BOILER))
        .when(F.col("text_len") < F.col("min_text_len"), F.lit(LABEL_NOISE))
        .when(
            F.col("link_density") >= F.col("link_density_max"),
            F.lit(LABEL_BOILER),
        )
        .otherwise(F.lit(LABEL_CONTENT))
    )
    crossed = real.crossJoin(grid_df).withColumn("swept_label", label)
    content = F.col("swept_label") == LABEL_CONTENT
    unmatched = content & F.col("pattern_label").isNull()
    return crossed.groupBy(
        "cfg_id", "min_text_len", "link_density_max"
    ).agg(
        F.countDistinct(F.when(unmatched, F.col("tag_path"))).alias(
            "n_unmatched_classes"
        ),
        F.sum(content.cast("long")).alias("n_content_blocks"),
        F.sum(F.when(content, F.col("text_len")).otherwise(0)).alias(
            "total_content_chars"
        ),
    )


def best_config(
    swept: DataFrame, min_coverage_chars: int
) -> tuple[int, int, float]:
    """argmin bookfont-size among configs meeting the coverage floor
    (selthresh's minimization with a non-degeneracy guard);
    deterministic tie-break on (cfg_id)."""
    ok = swept.filter(F.col("total_content_chars") >= min_coverage_chars)
    row = ok.orderBy(
        F.asc("n_unmatched_classes"), F.asc("cfg_id")
    ).first()
    if row is None:
        raise ValueError("no config meets the coverage floor")
    return row.cfg_id, row.min_text_len, row.link_density_max


def sweep_engines(blocks: DataFrame, patterns: DataFrame) -> DataFrame:
    """Engine sweep — the ``tune_skel_global`` analogue (skel.c:2006+):
    run every comparison engine over the same blocks × library and
    report per-engine quality proxies. Four passes over the candidate
    set (the engine changes the SCORE expression, so unlike the
    threshold sweep this cannot ride one crossJoin pass).

    Returns (engine, n_strong, n_weak, n_unmatched, mean_score)."""
    from ..stages.engines import ENGINES, classify_scored

    outs = []
    for engine in ENGINES:
        scored = classify_scored(blocks, patterns, engine=engine).filter(
            F.col("pos") >= 0
        )
        outs.append(
            scored.agg(
                F.lit(engine).alias("engine"),
                F.sum((F.col("match_grade") == "strong").cast("long")).alias(
                    "n_strong"
                ),
                F.sum((F.col("match_grade") == "weak").cast("long")).alias("n_weak"),
                F.sum(F.col("match_grade").isNull().cast("long")).alias(
                    "n_unmatched"
                ),
                F.round(F.avg("match_score"), 4).alias("mean_score"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
