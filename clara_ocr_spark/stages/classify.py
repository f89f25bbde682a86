"""Stage D — classification: blocks × pattern library → labeled blocks.

≈ Clara step_9 ``classify`` (symbol.c:3878-4384): every symbol is
compared against the pattern library with a cheap filter then a scored
match, strong matches accepted immediately, heuristics as fallback.

Spark shape: **broadcast join** against the (small) pattern table on
the tag-path fingerprint (the bmpcmp_skel containment test recast,
symbol.c:3286-3775), then a pure ``F.when`` rule chain mirroring
:func:`clara_ocr_spark.extract_rules.classify_block` — all JVM-side,
whole-stage-codegen friendly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..extract_rules import (
    LABEL_BOILER,
    LABEL_CONTENT,
    LABEL_NOISE,
    LINK_DENSITY_MAX,
    MIN_TEXT_LEN,
    NAV_COMPONENTS,
)


def heuristic_label(
    min_text_len: int = MIN_TEXT_LEN,
    link_density_max: float = LINK_DENSITY_MAX,
) -> F.Column:
    """The ordered rule chain as one JVM expression (mirrors
    extract_rules.classify_block exactly — byte-identity depends on
    it). The thresholds default to the reference semantics; non-default
    values select an alternative parse strategy (the ``bin_method``
    analogue, common.h:297-299 — used by the hqbin second pass)."""
    comps = F.split(F.col("tag_path"), "/")
    is_nav = F.arrays_overlap(
        comps, F.array(*[F.lit(c) for c in sorted(NAV_COMPONENTS)])
    )
    return (
        F.when(F.col("pattern_label").isNotNull(), F.col("pattern_label"))
        .when(is_nav, F.lit(LABEL_BOILER))
        .when(F.col("text_len") < min_text_len, F.lit(LABEL_NOISE))
        .when(F.col("link_density") >= link_density_max, F.lit(LABEL_BOILER))
        .otherwise(F.lit(LABEL_CONTENT))
    )


def heuristic_score(
    min_text_len: int = MIN_TEXT_LEN,
    link_density_max: float = LINK_DENSITY_MAX,
) -> F.Column:
    """Match quality 0-10 (≈ bq, symbol.c:4230): pattern hits are
    strong (10); each heuristic rule carries its own confidence."""
    comps = F.split(F.col("tag_path"), "/")
    is_nav = F.arrays_overlap(
        comps, F.array(*[F.lit(c) for c in sorted(NAV_COMPONENTS)])
    )
    return (
        F.when(F.col("pattern_label").isNotNull(), F.lit(10))
        .when(is_nav, F.lit(7))
        .when(F.col("text_len") < min_text_len, F.lit(6))
        .when(F.col("link_density") >= link_density_max, F.lit(6))
        .otherwise(F.lit(5))
    )


def classify(
    blocks: DataFrame,
    patterns: DataFrame | None = None,
    min_text_len: int = MIN_TEXT_LEN,
    link_density_max: float = LINK_DENSITY_MAX,
) -> DataFrame:
    """Label every block.

    ``patterns(fingerprint string, label string)`` is the trained
    library (≈ pdesc book font, common.h:937-965); broadcast because it
    is tiny relative to the corpus.  ``None`` → heuristics only
    (a fresh book with an empty font). Threshold defaults reproduce the
    byte-identity reference semantics; overrides select an alternative
    strategy (hqbin second pass).
    """
    if patterns is not None:
        pat = F.broadcast(
            patterns.select(
                F.col("fingerprint").alias("_pat_fp"),
                F.col("label").alias("pattern_label"),
            ).dropDuplicates(["_pat_fp"])
        )
        blocks = blocks.join(
            pat, blocks["tag_path"] == pat["_pat_fp"], "left"
        ).drop("_pat_fp")
    else:
        blocks = blocks.withColumn("pattern_label", F.lit(None).cast("string"))
    return blocks.withColumn(
        "label", heuristic_label(min_text_len, link_density_max)
    ).withColumn("score", heuristic_score(min_text_len, link_density_max))
