"""The crawl engine: seed → discover → fetch → extract → dedup → index.

One *epoch* is one Spark DAG over the snapshot-versioned state
(``SnapshotStore``): the reference's master/worker/queue trio
(``code/core/master.py``, ``worker.py``, ``queue_interface*.py``) becomes a
driver loop that each iteration

1. **discovers** due sites' sitemaps (robots ``SchemaMap:`` directives →
   sitemap XML → file URLs; fallback chain per master.py:103-127) and
   maintains the frontier incrementally via two anti-joins (J1/J2);
2. **selects** pending work within per-host politeness budgets (salted
   two-phase top-k, see ``operators/politeness.py``);
3. **fetches** by joining the frontier against the ``pages`` table (the
   deterministic stand-in for HTTP — S1; a real deployment swaps this join
   for a ``mapInPandas`` HTTP kernel with identical columns);
4. **extracts** JSON-LD objects (Arrow-batched ``mapInPandas``), diffs ids
   against the URL-seen set (Bloom pre-filter + exact anti-join), ref-counts
   first-occurrences / orphans set-wise (A1 as one groupBy per epoch);
5. **indexes** first-occurrence objects (essential-fields text → embedding)
   into ``documents`` and applies orphan deletes;
6. **commits** frontier/url_seen/documents/metrics snapshots atomically via
   the store manifest — crash anywhere ⇒ re-run epoch from last commit.

Every join/agg is keyed by (user_id-scoped) url columns with the frontier
partitioned on ``host_hash``; the only custom physical tactics are the salt
and the Bloom (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions.canonical import doc_key_expr, host_from_url_expr, host_hash_expr
from crawler_spark.functions.embed import embed_binary_udf
from crawler_spark.functions.extract import EXTRACTED_SCHEMA, explode_jsonld
from crawler_spark.functions.sitemap import (
    parse_sitemap_udf,
    robots_crawl_delay_udf,
    robots_schema_maps_udf,
)
from crawler_spark.operators import frontier as fr
from crawler_spark.operators import politeness, seen
from crawler_spark.schema import FRONTIER, URL_SEEN
from crawler_spark.sources.tables import SnapshotStore


@dataclass
class CrawlConfig:
    num_partitions: int = 32
    per_host_budget: int = 64
    salt_buckets: int = 16
    epoch_window_s: float = 60.0
    use_bloom: bool = True
    embed_documents: bool = True
    max_epochs: int = 50
    #: per-epoch counters in EpochReport cost extra Spark jobs; bench turns
    #: them off and derives totals from the committed state instead.
    collect_stats: bool = True


@dataclass
class EpochReport:
    epoch: int
    selected: int = 0
    fetched_ok: int = 0
    fetch_failed: int = 0
    ids_extracted: int = 0
    ids_added: int = 0
    ids_removed: int = 0
    docs_added: int = 0
    docs_deleted: int = 0
    files_added: int = 0
    files_removed: int = 0
    wall_s: float = 0.0
    extra: dict = field(default_factory=dict)


def _https(col):
    """Seeds are stored normalized (no scheme, db.py:13-34); fetches need one."""
    return F.concat(F.lit("https://"), col)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.cfg = config or CrawlConfig()
        # Column-pruned page projections; bodies only where needed.
        self._pages = pages
        self._page_bodies = pages.select("url", "html")

    # ------------------------------------------------------------------
    # bootstrap / state access
    # ------------------------------------------------------------------

    def bootstrap(self, seeds: DataFrame) -> None:
        """Initialize state tables; idempotent (no-op if already committed)."""
        if self.store.exists("frontier"):
            return
        empty_frontier = self.spark.createDataFrame([], FRONTIER)
        empty_seen = self.spark.createDataFrame([], URL_SEEN)
        versions = {
            "seeds": self.store.write(seeds, "seeds"),
            "frontier": self.store.write(empty_frontier, "frontier"),
            "url_seen": self.store.write(empty_seen, "url_seen"),
        }
        self.store.commit(epoch=-1, table_versions=versions)

    def frontier(self) -> DataFrame:
        return self.store.read(self.spark, "frontier")

    def url_seen(self) -> DataFrame:
        return self.store.read(self.spark, "url_seen")

    def documents(self) -> DataFrame:
        if not self.store.exists("documents"):
            from crawler_spark.schema import DOCUMENTS

            return self.spark.createDataFrame([], DOCUMENTS)
        return self.store.read(self.spark, "documents")

    # ------------------------------------------------------------------
    # discovery (lifecycle 3.1 / 3.3)
    # ------------------------------------------------------------------

    def _due_seeds(self, epoch: int) -> DataFrame:
        """F5: last_processed IS NULL OR last_processed + interval <= now(epoch)."""
        now = F.lit(fr.epoch_ts(epoch)).cast("timestamp")
        return self.store.read(self.spark, "seeds").filter(
            F.col("is_active")
            & (
                F.col("last_processed").isNull()
                | (F.col("last_processed") + F.make_interval(hours=F.col("interval_hours")) <= now)
            )
        )

    def discover(self, epoch: int) -> tuple[int, int]:
        """Maintain the frontier from due sites' sitemaps. Returns (added, removed)."""
        due = self._due_seeds(epoch).select("site_url", "user_id")
        if due.isEmpty():
            return 0, 0

        # robots.txt fetch (broadcast-sized side) → schemaMap directives (S2)
        robots = (
            due.withColumn("robots_url", _https(F.concat(F.col("site_url"), F.lit("/robots.txt"))))
            .join(self._page_bodies.withColumnRenamed("url", "robots_url"), "robots_url", "left")
            .withColumn("site_base", _https(F.col("site_url")))
            .withColumn("schema_maps", robots_schema_maps_udf("html", "site_base"))
            .withColumn("crawl_delay", robots_crawl_delay_udf("html"))
        )
        self._robots_state = (
            robots.select(
                F.col("site_url").alias("host"),
                "schema_maps",
                "crawl_delay",
                F.lit(fr.epoch_ts(epoch)).alias("fetched_at"),
            )
        )

        # fallback chain (S4): no robots directives → <site>/schema_map.xml
        maps = robots.select(
            "site_url",
            "user_id",
            "site_base",
            F.explode(
                F.when(
                    F.size("schema_maps") > 0, F.col("schema_maps")
                ).otherwise(F.array(F.concat(F.col("site_base"), F.lit("/schema_map.xml"))))
            ).alias("schema_map"),
        ).distinct()  # U2: unique schema maps per site

        # sitemap fetch + parse (S3) → candidate file urls
        candidates = (
            maps.join(self._page_bodies.withColumnRenamed("url", "schema_map"), "schema_map", "left")
            .withColumn("file_urls", parse_sitemap_udf("html", "site_base"))
            .select(
                "site_url", "user_id", "schema_map",
                F.explode("file_urls").alias("file_url"),
            )
            .dropDuplicates(["file_url", "user_id"])  # U4
        )

        frontier_df = self.frontier()
        added_cand, removed_rows = fr.diff_discovery(frontier_df, candidates, due)

        new_rows = fr.as_frontier_rows(added_cand, epoch, self.cfg.num_partitions)
        removal_jobs = (
            removed_rows.select("file_url", "user_id", "site_url", "schema_map")
            .transform(lambda df: fr.as_frontier_rows(df, epoch, self.cfg.num_partitions,
                                                      job_type="process_removed_file"))
        )

        # soft-delete removed process_file rows (is_active=0) + enqueue both kinds
        updated = fr.transition(
            frontier_df,
            deactivated=removed_rows.select(
                "file_url", "user_id", F.lit("process_file").alias("job_type")),
        )
        # a file can reappear later: drop superseded removal jobs for re-added files
        updated = updated.unionByName(new_rows).unionByName(removal_jobs)

        # counting costs two extra jobs; bench (collect_stats=False) derives
        # totals from committed state instead
        n_added = new_rows.count() if self.cfg.collect_stats else -1
        n_removed = removal_jobs.count() if self.cfg.collect_stats else -1
        v = self.store.write(updated.repartition(self.cfg.num_partitions, "host_hash"), "frontier")

        # stamp last_processed on discovered seeds (scheduler.py:21-30 analogue)
        seeds_df = self.store.read(self.spark, "seeds")
        stamped = (
            seeds_df.join(due.select("site_url", "user_id").withColumn("_hit", F.lit(True)),
                          ["site_url", "user_id"], "left")
            .withColumn(
                "last_processed",
                F.when(F.col("_hit"), F.lit(fr.epoch_ts(epoch))).otherwise(F.col("last_processed")),
            )
            .drop("_hit")
        )
        sv = self.store.write(stamped, "seeds")
        rv = self.store.write(self._robots_state, "robots")
        self.store.commit(epoch, {"frontier": v, "seeds": sv, "robots": rv},
                          lineage_row={"stage": "discover", "added": n_added, "removed": n_removed})
        return n_added, n_removed

    # ------------------------------------------------------------------
    # one epoch of the hot path (lifecycle 3.2)
    # ------------------------------------------------------------------

    def run_epoch(self, epoch: int) -> EpochReport:
        import time as _time

        t0 = _time.time()
        rep = EpochReport(epoch=epoch)
        cfg = self.cfg

        frontier_df = self.frontier()
        pending = frontier_df.filter((F.col("status") == "pending") & F.col("is_active"))

        robots = (
            self.store.read(self.spark, "robots").select("host", "crawl_delay")
            if self.store.exists("robots") else None
        )
        # politeness selection: budget applies to the *site host*; file hosts
        # equal site hosts in this corpus but we key on the row's host column.
        selected, _deferred = politeness.select_within_budget(
            pending, robots, cfg.per_host_budget, cfg.salt_buckets, cfg.epoch_window_s
        )
        selected = politeness.salted_repartition(selected, cfg.num_partitions, cfg.salt_buckets)
        selected.cache()
        rep.selected = selected.count()
        if rep.selected == 0:
            selected.unpersist()
            rep.wall_s = _time.time() - t0
            return rep

        fetch_jobs = selected.filter(F.col("job_type") == "process_file")
        removal_jobs = selected.filter(F.col("job_type") == "process_removed_file")

        # --- fetch (S1): join against pages; missing page == HTTP failure ---
        fetched = (
            fetch_jobs.select("file_url", "user_id", "site_url", "queued_at")
            .join(self._page_bodies.withColumnRenamed("url", "file_url"), "file_url", "left")
            .withColumn("content_length", F.octet_length("html").cast("long"))
        )
        fetched.cache()
        ok = fetched.filter(F.col("html").isNotNull())
        failed = fetched.filter(F.col("html").isNull()).select("file_url", "user_id")

        # --- extract (C4/C6): ONE Arrow pass body → object rows, then
        # materialized to scratch parquet. Several sinks (url_seen, documents,
        # frontier, metrics) all derive from the extract output; pinning it
        # once guarantees the Python stage runs exactly once per epoch
        # regardless of how many downstream DAGs reference it.
        extracted_raw = (
            ok.select("file_url", F.col("html").alias("body"))
            .mapInPandas(explode_jsonld, schema=EXTRACTED_SCHEMA)
            .withColumn("partition_id", F.spark_partition_id())
        )
        meta = ok.select("file_url", "user_id", "site_url", "queued_at", "content_length")
        scratch = self.store.materialize(
            self.spark,
            extracted_raw.join(meta, "file_url")
            .dropDuplicates(["file_url", "user_id", "id"]),  # U1 set(ids)
            "extracted_epoch",
        )
        extracted = scratch.filter(F.col("id").isNotNull())
        if cfg.collect_stats:
            rep.ids_extracted = extracted.count()

        # fetch accounting for metrics (A6): bytes + ids per url
        # (null-id marker rows keep zero-object files in the accounting)
        per_file = scratch.groupBy("file_url", "user_id").agg(
            F.max("num_ids").alias("num_ids"),
            F.first("partition_id").alias("partition_id"),
            F.max("content_length").alias("content_length"),
        )

        # --- seen-set maintenance (J3/J4 + A1), incl. removed-file wipes ---
        seen_df = self.url_seen()
        processed_keys = (
            ok.select("file_url", "user_id")
            .unionByName(removal_jobs.select("file_url", "user_id"))
        )
        existing = seen_df.join(processed_keys, ["file_url", "user_id"], "left_semi")

        ext_ids = extracted.select(
            "file_url", "user_id", "id", "queued_at",
            host_hash_expr(host_from_url_expr(F.col("file_url")), cfg.num_partitions)
            .alias("host_hash"),
        )
        added = seen.anti_join_new_ids(ext_ids, existing, use_bloom=cfg.use_bloom)
        removed = existing.select("file_url", "user_id", "id").join(
            ext_ids, ["file_url", "user_id", "id"], "left_anti"
        )
        added.cache(); removed.cache()
        if cfg.collect_stats:
            rep.ids_added = added.count()
            rep.ids_removed = removed.count()

        seen_after = (
            seen_df.join(removed, ["file_url", "user_id", "id"], "left_anti")
            .unionByName(added.select("file_url", "user_id", "id", "host_hash"))
        )

        # --- ref-count gates (A1) BEFORE the expensive embed stage ---
        firsts = seen.first_occurrences(added, seen_df.select("id", "user_id").distinct())
        orphans = seen.orphaned_ids(removed, seen_after)

        docs = self.documents()
        if cfg.embed_documents:
            new_docs = (
                firsts.join(
                    extracted.select("file_url", "user_id", "id", "obj_json",
                                     "types", "type_list", "essential_text", "site_url"),
                    ["file_url", "user_id", "id"],
                )
                # F3: BreadcrumbList objects are never indexed. Exact element
                # match on the @type list (worker.py:221-226) — a substring
                # test on the display string would wrongly skip e.g.
                # `BreadcrumbListItem`.
                .filter(~F.array_contains("type_list", "BreadcrumbList"))
                # explicit parallelism for the embed stage: AQE coalesces the
                # join output by its ~1 KB/row size, but the embed expands each
                # row by a 6 KB vector — without this repartition the most
                # expensive stage of the pipeline runs in a handful of tasks
                .repartition(cfg.num_partitions * 2)
                .select(
                    doc_key_expr(F.col("id")).alias("id"),
                    F.col("id").alias("url"),
                    F.col("site_url").alias("site"),
                    F.col("types").alias("type"),
                    F.col("obj_json").alias("content"),
                    F.col("essential_text"),
                    F.lit(fr.epoch_ts(epoch)).alias("timestamp"),
                    embed_binary_udf(F.col("essential_text")).alias("embedding"),
                )
            )
            surviving = docs.join(
                orphans.select(doc_key_expr(F.col("id")).alias("id")), "id", "left_anti"
            )
            docs_after = surviving.unionByName(new_docs)
        else:
            docs_after = docs
            new_docs = None

        # --- frontier transitions + metrics ---
        # per_file covers every fetched-ok file (zero-object files included
        # via the extract kernel's marker rows), so `done` reads straight off
        # the materialized scratch — no second pass over the fetch join.
        done = (
            per_file.select(
                "file_url", "user_id",
                F.col("num_ids").cast("int").alias("number_of_items"))
            .withColumn("job_type", F.lit("process_file"))
        )
        frontier_after = fr.transition(
            frontier_df,
            done=done,
            failed=failed.withColumn("job_type", F.lit("process_file")),
            deactivated=removal_jobs.select(
                "file_url", "user_id", F.lit("process_removed_file").alias("job_type")),
            epoch=epoch,
        )

        metrics = (
            per_file.select(
                F.lit(epoch).alias("epoch"),
                F.col("partition_id"),
                F.col("file_url").alias("url"),
                F.lit(200).alias("status_code"),
                F.col("content_length"),
                F.col("num_ids").cast("int").alias("num_ids_extracted"),
                F.lit(None).cast("string").alias("error"),
                F.lit(fr.epoch_ts(epoch)).cast("timestamp").alias("ts"),
            )
            .unionByName(
                failed.select(
                    F.lit(epoch).alias("epoch"),
                    F.lit(None).cast("int").alias("partition_id"),
                    F.col("file_url").alias("url"),
                    F.lit(404).alias("status_code"),
                    F.lit(None).cast("long").alias("content_length"),
                    F.lit(0).alias("num_ids_extracted"),
                    F.lit("fetch failed").alias("error"),
                    F.lit(fr.epoch_ts(epoch)).cast("timestamp").alias("ts"),
                )
            )
        )

        # --- commit ---
        docs_before = (
            self.store.read(self.spark, "documents").count()
            if cfg.collect_stats and self.store.exists("documents") else 0
        )
        # url_seen first (its DAG materializes the added/removed caches the
        # documents sink reuses), then the three remaining sinks concurrently
        # from driver threads — they are independent DAGs over pinned inputs,
        # and on a cluster there is no reason for the short frontier/metrics
        # jobs to wait behind the long documents job.
        versions = {
            "url_seen": self.store.write(
                seen_after.repartition(cfg.num_partitions, "host_hash"), "url_seen"),
        }
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_frontier = pool.submit(
                self.store.write,
                frontier_after.repartition(cfg.num_partitions, "host_hash"), "frontier")
            f_docs = pool.submit(self.store.write, docs_after, "documents")
            # per-epoch lineage is append-only: O(1) write, unioned at read time
            f_metrics = pool.submit(self.store.append, metrics, "metrics", f"{epoch:06d}")
            versions["frontier"] = f_frontier.result()
            versions["documents"] = f_docs.result()
            f_metrics.result()

        if cfg.collect_stats:
            rep.fetched_ok = done.count()
            rep.fetch_failed = failed.count()
            # parquet footer count of the snapshot just written — never
            # re-runs the embed stage
            self.store.commit(epoch, versions, lineage_row=None)  # visibility for the read below
            rep.docs_added = self.store.read(self.spark, "documents").count() - docs_before
        self.store.commit(epoch, versions, lineage_row={
            "stage": "epoch", "selected": rep.selected, "fetched_ok": rep.fetched_ok,
            "ids_added": rep.ids_added, "ids_removed": rep.ids_removed,
        })

        for df in (selected, fetched, added, removed):
            df.unpersist()
        rep.wall_s = _time.time() - t0
        return rep

    # ------------------------------------------------------------------
    # full loop with resume (T1/T5 + checkpointing)
    # ------------------------------------------------------------------

    def run(self, discover_each_epoch: bool = False) -> list[EpochReport]:
        """Drive epochs to fixed point, resuming from the manifest's epoch."""
        reports: list[EpochReport] = []
        start = self.store.read_manifest()["epoch"] + 1
        for epoch in range(start, start + self.cfg.max_epochs):
            if epoch == start or discover_each_epoch:
                self.discover(epoch)
            rep = self.run_epoch(epoch)
            reports.append(rep)
            if rep.selected == 0:
                break
        return reports
