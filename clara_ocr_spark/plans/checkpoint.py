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
    pushdown instead of recomputing the Python stage).

    Bumps the table ``_VERSION`` fence so an in-flight
    :func:`merge_upsert` whose snapshot predates this overwrite
    rejects its publish instead of silently resurrecting replaced
    rows (ADVICE r3: writers that don't bump the fence make their
    conflicts invisible to it)."""
    version = _table_version(path)
    df.write.mode("overwrite").format(CHECKPOINT_FORMAT).save(path)
    _write_version(path, version + 1)
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
    """Append an increment and bump the ``_VERSION`` fence: a merge
    that read the table before this append must not publish a
    survivor set that drops the appended rows (ADVICE r3)."""
    version = _table_version(extracted_path)
    df.write.mode("append").format(CHECKPOINT_FORMAT).save(extracted_path)
    _write_version(extracted_path, version + 1)


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


def _write_version(path: str, version: int) -> None:
    with open(os.path.join(path, "_VERSION"), "w") as f:
        f.write(str(version))


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _claim_creation(path: str) -> None:
    """Fence TABLE CREATION (ADVICE r3): without this, two concurrent
    merges on a not-yet-existing table both take the first-write
    overwrite path and the loser's batch vanishes — the lost-update
    anomaly the version fence exists to reject, just at version 0.

    A ``<path>.creating`` sentinel is claimed with ``open(..., 'x')``
    (atomic on POSIX); a second creator hits ``FileExistsError`` and
    raises :class:`ConcurrentWriteError`.  The sentinel records the
    claimant's pid so a claim orphaned by a crash (pid no longer
    alive) is swept instead of wedging the table forever — pid
    liveness is a single-node heuristic, which matches this fallback's
    scope (a real catalog's atomic metadata swap replaces all of
    this)."""
    sentinel = path.rstrip("/") + ".creating"
    for _attempt in (0, 1):
        try:
            with open(sentinel, "x") as f:
                f.write(str(os.getpid()))
            return
        except FileExistsError:
            try:
                with open(sentinel) as f:
                    pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            if _pid_alive(pid):
                raise ConcurrentWriteError(
                    f"{path}: concurrent table creation in progress "
                    f"(pid {pid}); retry after it publishes"
                ) from None
            # orphaned claim from a crashed creator — sweep and retry
            try:
                os.remove(sentinel)
            except OSError:
                pass
    raise ConcurrentWriteError(
        f"{path}: could not claim table creation (sentinel churn)"
    )


def _release_creation(path: str) -> None:
    try:
        os.remove(path.rstrip("/") + ".creating")
    except OSError:
        pass


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
    import glob
    import shutil

    from pyspark.sql import functions as F

    # Staging is PER-WRITER (pid-suffixed): a shared staging dir made
    # two live concurrent merges collide inside the parquet writer —
    # a hard crash, or worse, one writer publishing a directory the
    # other was still filling (found by the real two-process test,
    # VERDICT r3 item 5).  Debris from crashed writers is swept by
    # pid-liveness; a live writer's staging is left alone.
    staging = path.rstrip("/") + f".staging.{os.getpid()}"
    old = path.rstrip("/") + ".old"
    for stale in glob.glob(path.rstrip("/") + ".staging*"):
        pid_part = stale.rsplit(".", 1)[-1]
        if not pid_part.isdigit() or not _pid_alive(int(pid_part)):
            shutil.rmtree(stale, ignore_errors=True)
    if os.path.exists(old):
        if not os.path.exists(path):
            # Either a crash after rename(path -> old) — restore the
            # last good snapshot — or a LIVE publisher between its two
            # renames: its `.publishing` sentinel (pid) distinguishes
            # the cases, so the sweep never "restores" a table out
            # from under a publisher mid-swap.
            pub = path.rstrip("/") + ".publishing"
            try:
                with open(pub) as f:
                    pub_pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                pub_pid = 0
            if _pid_alive(pub_pid) and pub_pid != os.getpid():
                raise ConcurrentWriteError(
                    f"{path}: publish in progress by pid {pub_pid}; "
                    "retry after it completes"
                )
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
        _claim_creation(path)
        try:
            updates.write.mode("overwrite").format(
                CHECKPOINT_FORMAT
            ).save(path)
            _write_version(path, 1)
        finally:
            _release_creation(path)
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
    # Claim the table by renaming it aside.  A losing rename here
    # (path already claimed/republished, or .old occupied by a live
    # publisher) is a concurrent publish, not a crash — reject.  The
    # `.publishing` sentinel (pid) marks the window between the two
    # renames so another writer's debris sweep won't restore the .old
    # snapshot out from under us.
    pub = path.rstrip("/") + ".publishing"
    try:
        try:
            with open(pub, "x") as f:
                f.write(str(os.getpid()))
        except FileExistsError:
            try:
                with open(pub) as f:
                    other = int(f.read().strip() or "0")
            except (OSError, ValueError):
                other = 0
            if _pid_alive(other) and other != os.getpid():
                shutil.rmtree(staging, ignore_errors=True)
                raise ConcurrentWriteError(
                    f"{path}: publish in progress by pid {other}; "
                    "retry from a fresh snapshot"
                ) from None
            with open(pub, "w") as f:  # orphaned sentinel — take over
                f.write(str(os.getpid()))
        try:
            os.rename(path, old)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{path}: another writer is publishing; retry from a "
                "fresh snapshot"
            ) from None
        # Post-claim re-check: between the version check and the
        # claim a faster writer may have completed an ENTIRE publish
        # cycle, in which case the table we just claimed is newer
        # than our snapshot — restore it and reject, instead of
        # overwriting its commit.
        if _table_version(old) != read_version:
            os.rename(old, path)
            shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{path}: table republished during claim; retry from "
                "a fresh snapshot"
            )
        os.rename(staging, path)
        shutil.rmtree(old)
    finally:
        try:
            os.remove(pub)
        except OSError:
            pass
