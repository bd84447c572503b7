"""Frontier state machine: discovery diffs and epoch status transitions.

The reference's queue (send/receive/ack/nack + visibility timeout + stale-job
recovery, ``code/core/queue_interface.py``/``job_manager.py``) collapses into
columns on one table: ``status ∈ {pending, in_flight, done, error}``,
``retries`` (≤3 → error, job_manager.py:71), ``epoch``. A failed epoch is
re-run from the last committed snapshot, so no leases/heartbeats exist
(SURVEY.md §2.8 T2-T4).

Discovery = incremental view maintenance (T8): per epoch the candidate file
set from sitemaps is anti-joined both ways against the live frontier —
added files become ``pending`` jobs, vanished files become
``process_removed_file`` jobs and are soft-deleted (``is_active=false``),
exactly the reference's ``update_site_files`` diff (db.py:176-225, J1/J2).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.canonical import host_from_url_expr, host_hash_expr

MAX_RETRIES = 3  # reference job_manager.py:71

_KEY = ["file_url", "user_id", "job_type"]


def epoch_ts(epoch: int) -> datetime:
    """Deterministic queue timestamp for rows enqueued at ``epoch``.

    The reference stamps wall-clock enqueue time (master.py:177); the engine
    uses a fixed epoch-derived timestamp so crawl order — (epoch, queued_at,
    file_url), SURVEY.md §2.9 — is reproducible bit-for-bit.
    """
    base = datetime(2026, 1, 1, tzinfo=timezone.utc)  # epoch seconds 1767225600
    return datetime.fromtimestamp(base.timestamp() + epoch * 60, tz=timezone.utc)


def as_frontier_rows(
    candidates: DataFrame,
    epoch: int,
    num_partitions: int,
    job_type: str = "process_file",
    depth: int = 1,
    is_manual: bool = False,
) -> DataFrame:
    """Decorate discovered (site_url, user_id, schema_map, file_url) rows into
    full frontier rows (status=pending). ``is_manual`` marks rows added by the
    manual add API (db.py:376-390) — exempt from discovery-diff removal."""
    host = host_from_url_expr(F.col("file_url"))
    return (
        candidates
        .withColumn("job_type", F.lit(job_type))
        .withColumn("status", F.lit("pending"))
        .withColumn("retries", F.lit(0))
        .withColumn("depth", F.lit(depth))
        .withColumn("score", F.lit(0.0))
        .withColumn("host", host)
        .withColumn("host_hash", host_hash_expr(F.col("host"), num_partitions))
        .withColumn("queued_at", F.lit(epoch_ts(epoch)))
        .withColumn("epoch", F.lit(epoch))
        .withColumn("is_manual", F.lit(is_manual))
        .withColumn("is_active", F.lit(True))
        .withColumn("last_read_time", F.lit(None).cast("timestamp"))
        .withColumn("number_of_items", F.lit(None).cast("int"))
    )


def diff_discovery(
    frontier: DataFrame, candidates: DataFrame, discovered_sites: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(added_candidates, removed_files) — J1/J2 of SURVEY.md §2.3.

    ``candidates``: (site_url, user_id, schema_map, file_url) fresh from
    sitemaps. ``removed_files``: live process_file rows of *re-discovered*
    sites whose URL vanished from the new sitemap state. Manual rows
    (``is_manual``, added via :meth:`CrawlEngine.add_manual_files`) live
    outside the sitemap diff and are never removal candidates here — only
    the explicit manual-remove / site-delete APIs retire them.
    """
    file_key = ["file_url", "user_id"]
    live = frontier.filter(F.col("is_active") & (F.col("job_type") == "process_file"))
    added = candidates.join(live, file_key, "left_anti")
    in_scope = (
        live.filter(~F.col("is_manual"))
        .join(F.broadcast(discovered_sites), ["site_url", "user_id"], "left_semi")
    )
    removed = in_scope.join(candidates, file_key, "left_anti")
    return added, removed


def transition(
    frontier: DataFrame,
    done: DataFrame | None = None,
    failed: DataFrame | None = None,
    deactivated: DataFrame | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """Apply end-of-epoch status transitions and return the new frontier.

    * ``done`` (file_url, user_id, number_of_items): → status=done, stamp
      last_read_time (S8 ack / A2 count write-back, db.py:270-273);
    * ``failed`` (file_url, user_id): retries+1; < MAX_RETRIES → pending
      (nack/retry), else → error (job_manager escalation);
    * ``deactivated``: soft-delete (is_active=false, status=done) — the
      removed-file path (worker.py:284-311).
    """
    out = frontier
    ts = F.lit(epoch_ts(epoch) if epoch is not None else None).cast("timestamp")

    if done is not None:
        d = done.select(*_KEY, F.col("number_of_items").alias("_n_items"))
        out = (
            out.join(d.withColumn("_done", F.lit(True)), _KEY, "left")
            .withColumn("status", F.when(F.col("_done"), "done").otherwise(F.col("status")))
            .withColumn("last_read_time", F.when(F.col("_done"), ts).otherwise(F.col("last_read_time")))
            .withColumn(
                "number_of_items",
                F.when(F.col("_done"), F.col("_n_items")).otherwise(F.col("number_of_items")),
            )
            .drop("_done", "_n_items")
        )
    if failed is not None:
        f = failed.select(*_KEY).withColumn("_failed", F.lit(True))
        out = (
            out.join(f, _KEY, "left")
            .withColumn(
                "retries",
                F.when(F.col("_failed"), F.col("retries") + 1).otherwise(F.col("retries")),
            )
            .withColumn(
                "status",
                F.when(
                    F.col("_failed"),
                    F.when(F.col("retries") >= MAX_RETRIES, "error").otherwise("pending"),
                ).otherwise(F.col("status")),
            )
            .drop("_failed")
        )
    if deactivated is not None:
        x = deactivated.select(*_KEY).withColumn("_gone", F.lit(True))
        out = (
            out.join(x, _KEY, "left")
            .withColumn("is_active", F.when(F.col("_gone"), F.lit(False)).otherwise(F.col("is_active")))
            .withColumn("status", F.when(F.col("_gone"), "done").otherwise(F.col("status")))
            .drop("_gone")
        )
    return out
