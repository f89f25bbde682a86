"""Checkpoint-resumable stage execution + incremental recompute.

≈ Clara's session/acts/patterns files (``dump_session`` /
``recover_session``, cml.c:399-644, 925+) and the ``lfa``
last-analysed high-water mark (symbol.c:3996-3997): work already done
is never redone; a crashed run resumes from the last completed stage.

Iceberg would give snapshot isolation and MERGE here; this image has
no Iceberg jars, so checkpoints are parquet tables behind the same
API (swap ``format`` when the catalog is available — the access
pattern is identical).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_FORMAT = os.environ.get("SPARK_GRAFT_CHECKPOINT_FORMAT", "parquet")


def _done_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def checkpoint(df: DataFrame, path: str) -> DataFrame:
    """Write a stage output table and return the re-read DataFrame
    (cuts lineage; downstream stages scan columnar storage with
    pushdown instead of recomputing the Python stage)."""
    df.write.mode("overwrite").format(CHECKPOINT_FORMAT).save(path)
    return df.sparkSession.read.format(CHECKPOINT_FORMAT).load(path)


def resume_or_compute(
    spark: SparkSession, path: str, compute: Callable[[], DataFrame]
) -> DataFrame:
    """recover_session semantics: a completed checkpoint is read back;
    otherwise the stage runs and checkpoints. Spark's _SUCCESS marker
    is the completion flag (a partial write without it is recomputed)."""
    if os.path.exists(_done_marker(path)):
        return spark.read.format(CHECKPOINT_FORMAT).load(path)
    return checkpoint(compute(), path)


def incremental_delta(
    pages: DataFrame, extracted_path: str, key: str = "url"
) -> DataFrame:
    """High-water-mark incremental recompute (lfa analogue): only
    pages whose key is absent from the existing output table are
    processed — an anti-join, no per-row state."""
    spark = pages.sparkSession
    if not os.path.exists(_done_marker(extracted_path)):
        return pages
    done = spark.read.format(CHECKPOINT_FORMAT).load(extracted_path).select(key)
    return pages.join(done, key, "left_anti")


def append_increment(df: DataFrame, extracted_path: str) -> None:
    df.write.mode("append").format(CHECKPOINT_FORMAT).save(extracted_path)


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this merge's snapshot read and
    its publish — the optimistic-commit rejection a real catalog
    (Iceberg/Delta) raises. Retry the merge from a fresh read."""


#: test-only fault injection: called (with the table path) after the
#: staging write but before the version fence — the window where a
#: concurrent writer's publish must be detected
_TEST_BEFORE_PUBLISH = None


def _table_version(path: str) -> int:
    try:
        with open(os.path.join(path, "_VERSION")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    order_by: "list[str] | None" = None,
) -> None:
    """``MERGE INTO`` semantics for a keyed table (the acts/feedback
    ingest shape, ≈ ``process_webdata`` clara.c:2952-3013): WHEN
    MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT — incoming rows
    win on ``key``.

    On a real Iceberg/Delta catalog this is ONE atomic statement::

        MERGE INTO t USING u ON t.key = u.key
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

    with snapshot isolation and no read-modify-write window. This
    sandbox ships no table-format jars (SCALE.md), so the fallback
    materializes survivor ∪ updates into a staging directory and
    publishes it with two renames — NOT atomic (the table is briefly
    absent between them, and a crash mid-publish leaves debris), but
    crash-*recoverable*: stale ``.staging``/``.old`` debris from an
    interrupted publish is swept at entry, so the next merge always
    proceeds.

    Concurrent writers get the catalog's OPTIMISTIC-COMMIT semantics
    via a table version fence (the serializable-equivalence contract,
    VERDICT r2 item 3): each publish bumps a ``_VERSION`` marker, and
    a merge whose snapshot read is stale by publish time raises
    :class:`ConcurrentWriteError` instead of silently losing the other
    writer's rows (the lost-update anomaly MERGE INTO forbids). The
    fence closes the read-modify-write window up to the final
    check→rename race, which a filesystem cannot eliminate — a real
    catalog's atomic metadata swap is the production answer, with zero
    change to this call's shape.

    Per-key election is deterministic: when a batch carries several
    rows for one key, the row with the greatest ``order_by`` tuple
    wins (ties broken by the remaining columns in schema order), so
    replaying the same batch always yields the same table. With
    ``order_by=None`` the greatest full-row tuple wins."""
    import shutil

    from pyspark.sql import functions as F

    staging = path.rstrip("/") + ".staging"
    old = path.rstrip("/") + ".old"
    # Sweep debris from a publish interrupted between the two renames:
    # a leftover .old would make os.rename(path, old) raise forever,
    # and a leftover .staging would be half-written garbage.
    shutil.rmtree(staging, ignore_errors=True)
    if os.path.exists(old):
        if not os.path.exists(path):
            # Crashed after rename(path -> old) but before
            # rename(staging -> path): the .old snapshot is the last
            # good table — restore it.
            os.rename(old, path)
        else:
            shutil.rmtree(old, ignore_errors=True)

    cols = [c for c in updates.columns if c != key]
    order_cols = list(order_by) if order_by else []
    tiebreak = order_cols + [c for c in cols if c not in order_cols]
    updates = (
        updates.groupBy(key)
        .agg(F.max(F.struct(*tiebreak)).alias("_row"))
        .select(key, *[F.col(f"_row.{c}").alias(c) for c in cols])
    )

    if not os.path.exists(_done_marker(path)):
        updates.write.mode("overwrite").format(CHECKPOINT_FORMAT).save(path)
        with open(os.path.join(path, "_VERSION"), "w") as f:
            f.write("1")
        return
    read_version = _table_version(path)
    current = spark.read.format(CHECKPOINT_FORMAT).load(path)
    survivors = current.join(updates.select(key), key, "left_anti")
    survivors.unionByName(updates).write.mode("overwrite").format(
        CHECKPOINT_FORMAT
    ).save(staging)
    with open(os.path.join(staging, "_VERSION"), "w") as f:
        f.write(str(read_version + 1))
    if _TEST_BEFORE_PUBLISH is not None:
        _TEST_BEFORE_PUBLISH(path)
    # Optimistic commit: the snapshot this merge read must still be
    # the published table — a version bump since the read means the
    # survivors set is stale and publishing would drop another
    # writer's committed rows.
    if _table_version(path) != read_version:
        shutil.rmtree(staging, ignore_errors=True)
        raise ConcurrentWriteError(
            f"{path}: table advanced from v{read_version} to "
            f"v{_table_version(path)} during merge; retry from a "
            "fresh snapshot"
        )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
