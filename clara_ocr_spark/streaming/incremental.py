"""Incremental extraction driver — the ``clara.pl -d`` daemon analogue
(clara.pl:26-44: poll for new/changed pages every 30 s, process only
those), recast as Structured Streaming over the corpus directory.

The file source's checkpointed file log IS the work queue: shards
that arrive after the last trigger are the only ones read on the next
trigger; ``foreachBatch`` runs the identical batch pipeline (segment →
classify → assemble) on each micro-batch and appends to the extracted
table.  ``Trigger.AvailableNow`` gives the poll-until-drained batch
semantics of the daemon without a resident process.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..pipeline import extract

PAGES_SPARK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def run_incremental(
    spark: SparkSession,
    corpus_dir: str,
    out_path: str,
    checkpoint_dir: str,
    patterns: Optional[DataFrame] = None,
    mixed: bool = False,
) -> int:
    """Process all not-yet-seen corpus shards; returns the number of
    micro-batches executed.  Safe to call repeatedly (idempotent for
    already-processed files — the daemon's 'runnable page' test).
    ``mixed=True`` routes %PDF- payloads through the layout leg per
    micro-batch (same semantics as ``pipeline.extract_mixed``)."""
    stream = (
        spark.readStream.schema(PAGES_SPARK_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(corpus_dir)
    )
    n_batches = 0

    def process(batch: DataFrame, epoch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        if mixed:
            from ..pipeline import extract_mixed

            out = extract_mixed(batch, patterns)
        else:
            out = extract(batch, patterns)
        out.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches
