#!/usr/bin/env python
"""spark-submit entry point for the full training-data curation run:

    pages → extract[_mixed] → quality gate → near-dup canonicalize
          → curated/ + rejected/ + lineage metrics

    spark-submit --py-files dist/clara_ocr_spark.zip jobs/curate_job.py \\
        --input  s3://bucket/pages/    \\
        --curated s3://bucket/curated/ \\
        --rejects s3://bucket/rejects/ \\
        [--metrics s3://bucket/metrics/] [--run-id r1] [--mixed] \\
        [--set min_tokens=5 --set jaccard_tau=0.9]

Every input url lands in exactly one of curated/rejected (the step_6
consistency discipline, enforced by an explicit count gate here).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--curated", required=True)
    ap.add_argument("--rejects", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--run-id", default="adhoc")
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    args = ap.parse_args(argv)

    from jobs.extract_job import build_session

    from clara_ocr_spark.curate import CurateConfig, curate
    from clara_ocr_spark.pipeline import extract, extract_mixed
    from clara_ocr_spark.stages.consist import append_metrics, partition_lineage

    cfg = CurateConfig.from_args(args.overrides)
    spark = build_session()
    pages = spark.read.parquet(args.input)
    extracted = (extract_mixed if args.mixed else extract)(pages)
    curated, rejected = curate(extracted, cfg)
    curated.write.mode("overwrite").parquet(args.curated)
    rejected.write.mode("overwrite").parquet(args.rejects)

    # consistency gate: the two outputs partition the input exactly
    n_in = pages.select("url").distinct().count()
    n_cur = spark.read.parquet(args.curated).count()
    n_rej = spark.read.parquet(args.rejects).count()
    if n_cur + n_rej != n_in:
        raise AssertionError(
            f"curation lost/duplicated urls: {n_cur}+{n_rej} != {n_in}"
        )

    if args.metrics:
        out = spark.read.parquet(args.curated)
        append_metrics(
            partition_lineage(out, args.run_id, "curate"), args.metrics
        )
    spark.stop()


if __name__ == "__main__":
    main()
