"""Micro-batch crawl rounds: expand -> dedupe -> schedule -> fetch/extract
-> append, checkpoint-resumable with per-partition lineage (SURVEY.md §4.4/4.5).

One round is the distributed analog of one sweep of the reference's
``while pagination.has_next()`` loop
(``pygdpr/models/dpa/austria/__init__.py:72-153``), run for *all*
authorities/hosts at once.  Next-link pagination is inherently sequential
per seed chain (page k+1's URL is only known after parsing page k), so a
chain advances one page per round while thousands of chains/hosts advance
in parallel — the reference's own loop structure, parallelized across its
outer dimension (SURVEY.md §7.3.2).

Commit protocol per round: documents / seen / fetch_log / frontier /
done / metrics commit first, the ``lineage`` row commits LAST and is the
round's commit point — resume rolls every table back to the snapshot ids
in the last lineage row, so a crash mid-commit replays the whole round
idempotently (the reference instead loses its entire run delta on crash,
``gdprCrawler.py:292-301``).

Frontier state is O(round) per round, not O(frontier):

- the **pending set** is a merge-on-read table (``tables.MorTable``):
  a round commits one add part (new children + retry re-pends) and one
  equality-delete part (the round's scheduled + robots-denied rows,
  keyed ``(url_hash, retry_count)``), never a rewrite of the 10^10-row
  table.  Tombstones fold into the base every ``compact_after`` commits
  (amortized O(delta) writes) — Iceberg v2 merge-on-read MERGE on a
  real cluster.
- **terminal rows** append to the ``done`` log (state fetched/failed);
  "the frontier" of the north rule is pending ∪ done
  (:meth:`CrawlRun.frontier_view`).
- **per-partition lineage offsets** are carried forward incrementally:
  previous round's offsets + this round's per-shard add counts (a
  round-sized aggregation), replacing the full frontier
  groupBy(shard).count() per round.
- membership checks against the big tables (P5 page-revisit, P3 seen,
  P4 final keys) go through the sharded Blooms + probe-shaped
  anti-joins (seen.anti_join_probe): the big side is scanned —
  bucket-pruned under Iceberg — but never shuffled.

Retry semantics (R4, ``pygdpr/models/dpa/__init__.py:450-452``
``MaxRetriesError``): a missed URL re-enters pending with
``retry_count+1`` until ``max_attempts`` fetches have failed, then goes
terminal ``failed``.  The bumped retry_count doubles as the MoR
re-admission key, so a re-pend survives its own tombstone without
sequence numbers.

html bytes never enter a shuffle: they come off the ``pages`` scan side
of the fetch join and are consumed immediately by the mapInPandas stage
(column pruning keeps them out of everything else).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import frontier as FR
from . import schema as S
from . import seen as SN
from . import urls
from .extract import EXTRACT_OUT, LINK_BITS, MAX_LINK, make_fetch_extract
from .tables import MorTable, SnapshotTable


class CrawlRun:
    """State + driver for one resumable crawl over a ``pages`` table."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        pages_path: str,
        seeds_path: str,
        robots_path: str,
        as_of: date,
        run_id: int = 1,
        round_seconds: float = 60.0,
        use_bloom: bool = True,
        n_shards: int = SN.DEFAULT_SHARDS,
        light_stats: bool = False,
        store_content: bool = True,
        broadcast_rows_max: int = 2_000_000,
        max_attempts: int = 3,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.pages_path = pages_path
        self.seeds_path = seeds_path
        self.robots_path = robots_path
        self.as_of = as_of
        self.run_id = run_id
        self.round_seconds = round_seconds
        self.use_bloom = use_bloom
        self.n_shards = n_shards
        # light_stats skips the per-round count() actions over the heavy
        # round output (doc count is recovered from the tiny metrics agg)
        self.light_stats = light_stats
        # store_content=False stores documents by-reference (text +
        # metadata only; raw bytes stay in the pages table, addressable
        # by url) — the normalized layout at 100 TB, halving write
        # volume.  True mirrors the reference's raw-file-plus-text sink
        # (pygdpr/models/dpa/austria/__init__.py:134-148).
        self.store_content = store_content
        # above this many scheduled rows the fetch join falls back from a
        # broadcast hint to a plain equi-join (AQE / storage-partitioned
        # join on a real cluster) instead of OOMing the driver
        self.broadcast_rows_max = broadcast_rows_max
        # R4: total fetch attempts per URL before terminal failure
        self.max_attempts = max_attempts

        t = lambda name, sch: SnapshotTable(os.path.join(state_dir, name), sch)
        # the pending set keeps the historical "frontier" directory/column
        # names; terminal rows live in the append-only done log
        self.pending = MorTable(
            os.path.join(state_dir, "frontier"),
            S.FRONTIER,
            delete_keys=["url_hash", "retry_count"],
        )
        self.done = t("done", S.FRONTIER)
        self.seen = t("seen", S.SEEN)
        self.bloom = t("seen_bloom", S.SEEN_BLOOM)
        # second sharded Bloom over *frontier url_hashes* (the north-star
        # "URL-seen filter"): P5 page-revisit dedupe consults it so the
        # common case (brand-new child URL) never joins the big frontier
        self.url_bloom = t("url_bloom", S.SEEN_BLOOM)
        self.documents = t("documents", S.DOCUMENTS)
        self.fetch_log = t("fetch_log", S.FETCH_LOG)
        self.lineage = t("lineage", S.LINEAGE)
        self.metrics = t("metrics", S.METRICS)

    # -- setup / resume -------------------------------------------------------

    def seeds_df(self) -> DataFrame:
        return self.spark.read.schema(S.SEEDS).parquet(self.seeds_path)

    def pages_df(self) -> DataFrame:
        return self.spark.read.schema(S.PAGES).parquet(self.pages_path)

    def robots_df(self) -> DataFrame:
        return self.spark.read.schema(S.ROBOTS).parquet(self.robots_path)

    def frontier_view(self) -> DataFrame:
        """The logical frontier of the north rule: pending ∪ done."""
        return self.pending.read(self.spark).unionByName(
            self.done.read(self.spark)
        )

    def init(self) -> None:
        """Seed the frontier (round 0 commit point)."""
        if self.pending.current_snapshot_id() is not None:
            return
        seeded = self.pending.commit_delta(
            self.spark, adds=FR.seed_frontier(self.seeds_df()), note="seed"
        )
        if self.use_bloom:
            self.url_bloom.overwrite(
                SN.bloom_build(
                    self.spark, seeded.select("url_hash"), None,
                    n_shards=self.n_shards,
                ),
                note="seed",
            )
        self._commit_lineage(
            round_id=0, fetched=0, extracted=0,
            delta_by_shard=self._shard_counts(seeded),
        )

    def last_committed_round(self) -> int | None:
        lin = self.lineage.read(self.spark)
        row = lin.agg(F.max("round_id").alias("r")).collect()[0]
        return None if row["r"] is None else int(row["r"])

    def resume(self) -> int:
        """Roll every table back to the last lineage commit point.

        Returns the next round id to run.  Any partial commits after the
        last lineage row are discarded (time-travel via snapshot ids).
        Leftover scratch from a crashed round is purged here (it is
        re-derived by replaying the round).  Bloom tables are *not*
        rolled back: a Bloom that is ahead of its base table only adds
        false positives, which the exact residue checks absorb.
        """
        shutil.rmtree(os.path.join(self.state_dir, "scratch"), ignore_errors=True)
        last = self.last_committed_round()
        if last is None:
            self.init()
            return 1
        lin = (
            self.lineage.read(self.spark)
            .filter(F.col("round_id") == last)
            .select(
                "frontier_snapshot", "done_snapshot", "seen_snapshot",
                "documents_snapshot",
            )
            .limit(1)
            .collect()[0]
        )
        for table, sid in (
            (self.pending, lin["frontier_snapshot"]),
            (self.done, lin["done_snapshot"]),
            (self.seen, lin["seen_snapshot"]),
            (self.documents, lin["documents_snapshot"]),
        ):
            if not sid:
                # table had no snapshot at the commit point; discard any
                # partial commits by resetting to empty
                if table.current_snapshot_id() is not None:
                    table.overwrite(
                        self.spark.createDataFrame([], table.schema),
                        note="rollback-to-empty",
                    )
            elif table.current_snapshot_id() != sid:
                df = table.read(self.spark, sid)
                table.overwrite(df, note=f"rollback-to-{sid}")
        return last + 1

    def _shard_counts(self, df: DataFrame) -> dict[int, int]:
        """Per-shard row counts of a round-sized delta (tiny collect)."""
        return {
            int(r["pid"]): int(r["n"])
            for r in df.groupBy(
                SN.shard_of(F.col("url_hash"), self.n_shards).alias("pid")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }

    def _commit_lineage(
        self,
        round_id: int,
        fetched: int,
        extracted: int,
        delta_by_shard: dict[int, int] | None = None,
    ) -> None:
        """One lineage row per url_hash shard (per-partition offsets).

        Offsets are *incremental*: previous round's offsets plus this
        round's per-shard add counts — O(round) work, replacing the full
        frontier groupBy(shard).count() (VERDICT round 1, finding 4).
        """
        offsets: dict[int, int] = {}
        if round_id > 0:
            for r in (
                self.lineage.read(self.spark)
                .filter(F.col("round_id") == round_id - 1)
                .select("partition_id", "frontier_offset")
                .collect()
            ):
                offsets[int(r["partition_id"])] = int(r["frontier_offset"])
        for pid, n in (delta_by_shard or {}).items():
            offsets[pid] = offsets.get(pid, 0) + n
        sids = (
            self.pending.current_snapshot_id() or "",
            self.done.current_snapshot_id() or "",
            self.seen.current_snapshot_id() or "",
            self.documents.current_snapshot_id() or "",
        )
        rows = [
            (round_id, *sids, pid, off, round_id, fetched, extracted)
            for pid, off in sorted(offsets.items())
        ] or [(round_id, *sids, 0, 0, round_id, fetched, extracted)]
        df = self.spark.createDataFrame(
            rows,
            "round_id long, frontier_snapshot string, done_snapshot string, "
            "seen_snapshot string, documents_snapshot string, "
            "partition_id int, frontier_offset long, "
            "bloom_version long, fetched long, extracted long",
        ).withColumn("committed_ts", F.current_timestamp())
        self.lineage.append(df, note=f"round-{round_id}")

    def _bloom_commit(
        self, table: SnapshotTable, delta: DataFrame, full: DataFrame, note: str
    ) -> None:
        """Merge ``delta`` url_hashes into a sharded Bloom table, growing
        it geometrically when any shard nears capacity (ROADMAP #7: a
        fixed 1<<20 bitset caps out at ~10^6 hashes/shard).

        The resize check reads only the 32 tiny state rows; a resize
        rebuilds from ``full`` (all hashes) at the next power-of-two size
        — an O(table) job that happens O(log n) times total, so the
        amortized per-round cost stays O(round).
        """
        prior = None
        cur_m, max_n = SN.DEFAULT_M_BITS, 0
        if table.current_snapshot_id() is not None:
            prior = table.read(self.spark)
            stats = prior.select(
                (F.length("bits") * 8).alias("m"), "n_items"
            ).collect()
            if stats:
                cur_m = max(int(r["m"]) for r in stats)
                max_n = max(int(r["n_items"]) for r in stats)
        target = SN.bloom_target_bits(max_n)
        if target > cur_m:
            state = SN.bloom_build(
                self.spark, full, None, n_shards=self.n_shards, m_bits=target
            )
        else:
            state = SN.bloom_build(
                self.spark, delta, prior, n_shards=self.n_shards, m_bits=cur_m
            )
        table.overwrite(state, note=note)

    # -- one round ------------------------------------------------------------

    def round(self, round_id: int) -> dict | None:
        """Run one micro-batch round; returns stats or None if frontier drained."""
        t0 = time.time()
        spark = self.spark
        pending_df = self.pending.read(spark)
        if pending_df.limit(1).count() == 0:
            return None

        # 1. robots gate (R5) — broadcast join, pandas UDF.  Both halves
        #    persist for the round: the gate output feeds budgets,
        #    scheduling, tombstones and the done log, and without the
        #    persist each consumer would re-run the UDF pass over pending.
        allowed, denied = FR.gate_robots(pending_df, self.robots_df())
        allowed = allowed.persist(StorageLevel.MEMORY_AND_DISK)
        denied = denied.persist(StorageLevel.MEMORY_AND_DISK)

        # 2. politeness schedule (R1) in salted per-host partitions
        budgets = FR.host_budgets(allowed, self.seeds_df(), self.round_seconds)
        scheduled = FR.schedule(allowed, budgets).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # count once: it both materializes the persist and gates the
        # broadcast hint (an unbounded round must degrade to a shuffle /
        # storage-partitioned join, not OOM the driver)
        n_sched = scheduled.count()

        # 3. fetch = equi-join vs pages (S3/S4).  The html column is the
        #    heavy payload: a plain left join would sort-merge-SHUFFLE the
        #    whole pages side (IO-bound, does not scale with cores), so
        #    instead the *scheduled* side — one short row per URL in
        #    flight this round — broadcasts against the pages scan
        #    (inner, size-gated).  Misses (404s) are recovered AFTER the
        #    extract stage from the round's own output (every hit emits
        #    exactly one doc-or-log row with its own url): a broadcast
        #    anti-join of the round-sized scheduled set against the
        #    round-sized hit set — the pages table is scanned exactly
        #    once per round and never shuffled.  html never leaves the
        #    scan partition; it is consumed immediately by the extract
        #    stage.
        pages = self.pages_df().select(
            "url", "html", F.col("lang").alias("page_lang")
        )
        sched_cols = scheduled.select(
            "url", "authority", "doc_type", "depth", "priority", "seq",
            "title", "release_date", "doc_hash", "raw_hash", "retry_count",
        )
        sched_side = (
            F.broadcast(sched_cols)
            if n_sched <= self.broadcast_rows_max
            else sched_cols
        )
        hits = pages.join(sched_side, "url", "inner").select(
            "url",
            "authority",
            "doc_type",
            "depth",
            "priority",
            "seq",
            "title",
            "release_date",
            "doc_hash",
            "raw_hash",
            "html",
            F.col("page_lang").alias("lang"),
        )
        # Materialize the extract output ONCE to scratch parquet instead
        # of caching it: a round's payload (html/text/content) is far
        # bigger than executor memory at scale, and a deserialized cache
        # of it OOMs the heap.  Parquet scratch gives every downstream
        # consumer (documents, seen, states, logs, metrics, expansion)
        # COLUMN-PRUNED reads — the slim consumers never touch the
        # payload columns at all.  store_content=False is applied inside
        # the UDF so payload bytes never cross the Arrow boundary.
        out_raw = hits.mapInPandas(
            make_fetch_extract(self.as_of, self.store_content), EXTRACT_OUT
        )
        scratch = os.path.join(self.state_dir, "scratch", f"round-{round_id}")
        out_raw.write.mode("overwrite").parquet(scratch)
        out_hits = spark.read.schema(EXTRACT_OUT).parquet(scratch)

        # miss recovery (P7): scheduled urls with no doc/log row in the
        # round output were absent from pages.  Synthesized as pure
        # relational rows — they never pass through Python at all.
        hit_urls = out_hits.filter(F.col("out_kind") != "child").select("url")
        miss_rows = sched_cols.join(F.broadcast(hit_urls), "url", "left_anti")
        miss_out = miss_rows.select(
            F.lit("log").alias("out_kind"),
            "url",
            F.col("url").alias("parent_url"),
            "authority",
            "doc_type",
            "depth",
            "priority",
            "seq",
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("date").alias("release_date"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("binary").alias("content"),
            F.lit(None).cast("string").alias("lang"),
            F.lit("miss").alias("status"),
            "doc_hash",
            "raw_hash",
        )
        out = out_hits.unionByName(miss_out)

        # 4a. expansion: depth-0 listing children — URL-level dedupe
        #     (Pagination.add_item + page_list memo, P5): the sharded
        #     url Bloom clears definitely-new urls without touching the
        #     frontier; the residue is verified with a probe-shaped
        #     anti-join (frontier scanned, never shuffled)
        url_bloom_state = (
            self.url_bloom.read(spark)
            if self.use_bloom and self.url_bloom.current_snapshot_id() is not None
            else None
        )
        seen_bloom_state = (
            self.bloom.read(spark)
            if self.use_bloom and self.bloom.current_snapshot_id() is not None
            else None
        )
        done_df = self.done.read(spark)
        enqueued_urls = pending_df.select("url_hash").unionByName(
            done_df.select("url_hash")
        )
        depth1_enqueued = pending_df.filter(F.col("depth") == 1).unionByName(
            done_df.filter(F.col("depth") == 1)
        )
        children = out.filter(F.col("out_kind") == "child")
        listing_children = SN.dedupe_against_seen(
            self._to_frontier_rows(
                children.filter(F.col("depth") == 0)
            ).dropDuplicates(["url_hash"]),
            enqueued_urls,
            url_bloom_state,
        )

        # 4b. expansion: depth-1 document candidates — X1 key + P3/P4
        cand = (
            children.filter(F.col("depth") == 1)
            .withColumn("raw_hash", F.md5(F.encode(F.col("title"), "UTF-8")))
            .withColumn("doc_hash", F.lit(None).cast("string"))
        )
        cand = self._to_frontier_rows(cand, keep_keys=True)
        admitted = FR.admit_candidates(
            cand,
            self._seen_for_p3(),
            depth1_enqueued,
            self.run_id,
            bloom_state=seen_bloom_state,
        )

        # 4c. expansion: depth>=2 file/redirect children (keys inherited
        #     from the parent; depth 3 = EDPB alert-redirect pdf)
        file_children = SN.dedupe_against_seen(
            self._to_frontier_rows(
                children.filter(F.col("depth") >= 2), keep_keys=True
            ).dropDuplicates(["url_hash"]),
            enqueued_urls,
            url_bloom_state,
        )

        new_rows = listing_children.unionByName(admitted).unionByName(file_children)

        # 5. documents: depth-1 doc rows + decoded depth-2 files; within a
        #    docpage, files >1 get '#<link_idx>' keys (fixtures oracle).
        #    Derived from out_hits (not the union): misses are never docs,
        #    and keeping the miss branch out of this plan stops Catalyst
        #    constant-folding create_map(NULL,...) -> NULL_MAP_KEY.
        docs = out_hits.filter(F.col("out_kind") == "doc").withColumn(
            "final_key",
            F.when(
                (F.col("depth") >= 2)
                & ((F.col("seq").bitwiseAND(F.lit(MAX_LINK))) > 1),
                F.concat(
                    F.col("doc_hash"),
                    F.lit("#"),
                    (F.col("seq").bitwiseAND(F.lit(MAX_LINK))).cast("string"),
                ),
            ).otherwise(F.col("doc_hash")),
        )
        doc_rows = docs.select(
            F.col("final_key").alias("doc_hash"),
            "authority",
            "doc_type",
            "url",
            F.create_map(F.col("lang"), F.col("title")).alias("title"),
            "release_date",
            "lang",
            "content",
            "text",
            F.lit(round_id).cast("long").alias("batch_id"),
            "seq",
        )

        # 6. seen delta: every depth-1 docpage fetched OK registers its
        #    final key (oracle: run_final_keys.add after docpage fetch)
        seen_delta = (
            out_hits.filter(
                (F.col("depth") == 1)
                & (F.col("status") == "ok")
                & (F.col("out_kind").isin("doc", "log"))
                & F.col("doc_hash").isNotNull()
            )
            .select("doc_hash", "raw_hash", "release_date", "seq")
            .distinct()
            .select(
                F.xxhash64(F.col("doc_hash")).alias("url_hash"),
                "doc_hash",
                "raw_hash",
                "release_date",
                "seq",
                F.lit(self.run_id).cast("long").alias("run_id"),
                F.current_timestamp().alias("first_seen_ts"),
                SN.shard_of(F.xxhash64(F.col("doc_hash")), self.n_shards).alias(
                    "shard"
                ),
            )
        )

        # 7. state transitions: every scheduled row leaves the pending
        #    set this round (tombstone on (url_hash, retry_count)) and
        #    either goes terminal in the done log or — a miss with
        #    attempts left (R4) — re-enters pending with retry_count+1.
        attempt_status = (
            out.filter(F.col("out_kind") != "child")
            .select(
                F.xxhash64(urls.canonicalize_simple(F.col("url"))).alias(
                    "url_hash"
                ),
                "status",
                F.length(F.col("text")).cast("long").alias("bytes"),
            )
            .dropDuplicates(["url_hash"])
        )
        sched_out = scheduled.join(
            F.broadcast(attempt_status), "url_hash", "left"
        ).withColumn("status", F.coalesce(F.col("status"), F.lit("miss")))
        fr_cols = [f.name for f in S.FRONTIER.fields]

        def _with_state(df: DataFrame, state: str) -> DataFrame:
            return df.withColumn("state", F.lit(state)).select(*fr_cols)

        ok_rows = sched_out.filter(F.col("status") == "ok")
        fail_rows = sched_out.filter(~F.col("status").isin("ok", "miss"))
        miss_sched = sched_out.filter(F.col("status") == "miss")
        can_retry = F.col("retry_count") + 1 < F.lit(self.max_attempts)
        repend_rows = _with_state(
            miss_sched.filter(can_retry).withColumn(
                "retry_count", F.col("retry_count") + 1
            ),
            "pending",
        )
        done_delta = (
            _with_state(ok_rows, "fetched")
            .unionByName(_with_state(fail_rows, "failed"))
            .unionByName(_with_state(miss_sched.filter(~can_retry), "failed"))
            .unionByName(_with_state(denied, "failed"))
        )
        tombstones = scheduled.select("url_hash", "retry_count").unionByName(
            denied.select("url_hash", "retry_count")
        )
        adds = new_rows.unionByName(repend_rows)

        # every scheduled row is one fetch attempt (the politeness unit)
        log_rows = sched_out.select(
            F.lit(round_id).cast("long").alias("batch_id"),
            "url",
            "url_hash",
            "host",
            "status",
            "bytes",
        )

        # -- stats (actions) --------------------------------------------------
        if self.light_stats:
            n_docs = n_seen = None
        else:
            n_docs = doc_rows.count()
            n_seen = seen_delta.count()

        met = (
            out.groupBy("authority")
            .agg(
                F.sum(F.when(F.col("out_kind") == "child", 1).otherwise(0)).alias(
                    "expanded"
                ),
                F.sum(F.when(F.col("out_kind") == "doc", 1).otherwise(0)).alias(
                    "fetched"
                ),
                F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias(
                    "failed"
                ),
                F.sum(
                    F.when(F.col("out_kind").isin("doc", "log"), 1).otherwise(0)
                ).alias("scheduled"),
                F.sum(
                    F.when(
                        F.col("text").isNotNull(), F.length("text")
                    ).otherwise(0)
                ).alias("bytes_extracted"),
            )
            .select(
                F.lit(round_id).cast("long").alias("round_id"),
                "authority",
                F.lit("*").alias("host"),
                F.col("expanded").cast("long"),
                F.lit(0).cast("long").alias("deduped"),
                F.col("scheduled").cast("long"),
                F.col("fetched").cast("long"),
                F.col("failed").cast("long"),
                F.col("bytes_extracted").cast("long"),
                F.lit(int((time.time() - t0) * 1000)).cast("long").alias("wall_ms"),
            )
        )

        # -- commits (lineage last = commit point) ----------------------------
        try:
            self.documents.append(doc_rows, note=f"round-{round_id}")
            _, seen_read = self.seen.append_read(
                spark, seen_delta, note=f"round-{round_id}"
            )
            if self.use_bloom:
                self._bloom_commit(
                    self.bloom,
                    delta=seen_read.select("url_hash"),
                    full=self.seen.read(spark).select("url_hash"),
                    note=f"round-{round_id}",
                )
            self.fetch_log.append(log_rows, note=f"round-{round_id}")
            add_read = self.pending.commit_delta(
                spark, adds=adds, deletes=tombstones, note=f"round-{round_id}"
            )
            self.done.append(done_delta, note=f"round-{round_id}")
            if self.use_bloom:
                self._bloom_commit(
                    self.url_bloom,
                    delta=add_read.select("url_hash"),
                    full=self.frontier_view().select("url_hash"),
                    note=f"round-{round_id}",
                )
            self.metrics.append(met, note=f"round-{round_id}")
            if self.light_stats and n_docs is None:
                # recover the doc count from the per-authority metrics
                # aggregation (tiny table) instead of a second pass over
                # the heavy round output
                n_docs = int(
                    self.metrics.read(spark)
                    .filter(F.col("round_id") == round_id)
                    .agg(F.coalesce(F.sum("fetched"), F.lit(0)).alias("n"))
                    .collect()[0]["n"]
                )
            # incremental lineage offsets: only genuinely-new rows count
            # (re-pends carry retry_count > 0 and were counted at first
            # enqueue)
            delta_by_shard = self._shard_counts(
                add_read.filter(F.col("retry_count") == 0)
            )
            n_new = sum(delta_by_shard.values())
            self._commit_lineage(
                round_id, fetched=n_sched, extracted=n_docs,
                delta_by_shard=delta_by_shard,
            )
        finally:
            scheduled.unpersist()
            allowed.unpersist()
            denied.unpersist()
            shutil.rmtree(scratch, ignore_errors=True)
        return {
            "round": round_id,
            "scheduled": n_sched,
            "docs": n_docs,
            "new_frontier_rows": n_new,
            "seen_delta": n_seen,
            "wall_s": time.time() - t0,
        }

    def _seen_for_p3(self) -> DataFrame:
        return self.seen.read(self.spark)

    def _to_frontier_rows(self, df: DataFrame, keep_keys: bool = False) -> DataFrame:
        canon = urls.canonicalize_simple(F.col("url"))
        return df.select(
            F.col("url"),
            F.xxhash64(canon).alias("url_hash"),
            "authority",
            "doc_type",
            "depth",
            "priority",
            urls.host_of(F.col("url")).alias("host"),
            "seq",
            F.lit("pending").alias("state"),
            F.lit(0).alias("retry_count"),
            "title",
            "release_date",
            (F.col("doc_hash") if keep_keys else F.lit(None).cast("string")).alias(
                "doc_hash"
            ),
            (F.col("raw_hash") if keep_keys else F.lit(None).cast("string")).alias(
                "raw_hash"
            ),
        )

    # -- full run ---------------------------------------------------------------

    def run(self, max_rounds: int = 1000) -> list[dict]:
        self.init()
        stats = []
        start = (self.last_committed_round() or 0) + 1
        for r in range(start, start + max_rounds):
            st = self.round(r)
            if st is None:
                break
            stats.append(st)
        return stats
