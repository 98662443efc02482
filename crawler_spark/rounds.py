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
of the fetch join and are consumed immediately by the mapInArrow stage
(column pruning keeps them out of everything else).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import date

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import frontier as FR
from . import schema as S
from . import seen as SN
from . import urls
from pyspark.sql import types as T

from .extract import EXTRACT_OUT, LINK_BITS, MAX_LINK, make_fetch_extract
from .tables import MorTable, SnapshotTable

# Scratch layout: EXTRACT_OUT plus row-local columns the sinks need —
# text_len (slim consumers account payload bytes without decompressing
# the payload column), final_key (the documents key incl. the
# '#<link_idx>' multi-file suffix, fixtures oracle), batch_id (constant
# per round, stored so every adopted part reads in ONE multi-path scan)
# — and a sink partition column splitting doc-destined payload rows
# from everything else, so the documents table can adopt the heavy
# partition by rename instead of rewriting it.
SCRATCH_FILE = T.StructType(
    list(EXTRACT_OUT.fields)
    + [
        T.StructField("text_len", T.LongType(), True),
        T.StructField("final_key", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), False),
    ]
)
SCRATCH_OUT = T.StructType(
    list(SCRATCH_FILE.fields) + [T.StructField("sink", T.StringType(), False)]
)


def docs_from_extract_parts(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Documents-schema view of adopted ``sink=doc`` scratch parts.

    Must stay value-identical to the projection the plain append path
    writes (and wrote historically): mixed manifests — plain parts from
    rollbacks/compactions next to adopted parts — union to one frame."""
    df = spark.read.schema(SCRATCH_FILE).parquet(*paths)
    return df.select(
        F.col("final_key").alias("doc_hash"),
        "authority",
        "doc_type",
        "url",
        F.create_map(F.col("lang"), F.col("title")).alias("title"),
        "release_date",
        "lang",
        "content",
        "text",
        "batch_id",
        "seq",
    )


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
        bloom_min_rows: int = 1_000_000,
        preprune_margin: int = 4,
        quota_budgets: dict[str, int] | None = None,
        quota_key: str = "authority",
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
        # broadcast hint to a plain equi-join instead of OOMing the
        # driver.  Measured on a 1.87M-URL round (round 3): isolated,
        # the shuffle join is ~4% faster at 32 cores — but in the full
        # crawl the pages-side html shuffle contends with scratch/state
        # writes on the same local disks and loses by ~25%, so the
        # local-mode default keeps broadcasting up to 2M rows.  On a
        # real cluster neither applies: the equi-join becomes an Iceberg
        # storage-partitioned join on bucketed url (no shuffle, no
        # driver-side build)
        self.broadcast_rows_max = broadcast_rows_max
        # R4: total fetch attempts per URL before terminal failure
        self.max_attempts = max_attempts
        # map-side top-k slack factor for the schedule pre-prune (the
        # rank window and robots UDF see O(budget x margin) rows per
        # salt per partition, never the whole pending set)
        self.preprune_margin = preprune_margin
        # R3 second-resource quota (translate_quota_service.py:8-29
        # pattern): {key -> max fetches per round}; rows past the quota
        # are deferred — they stay pending for the next round, the
        # declarative analog of the reference's 105 s back-off sleep
        # (pygdpr/models/dpa/__init__.py:656-659)
        self.quota_budgets = quota_budgets
        self.quota_key = quota_key
        # cost-based Bloom activation (same idea as AQE's broadcast
        # threshold): below this many enqueued URLs the exact probe-shaped
        # anti-joins are strictly cheaper than Bloom cogroup stages, so
        # the Bloom tables are neither built nor consulted; the first
        # round past the threshold builds them from the full tables
        # (one-time O(table), amortized O(round)).  Set 0 to force the
        # Bloom path (tests do).
        self.bloom_min_rows = bloom_min_rows

        # in-memory carry of per-shard lineage offsets between rounds —
        # avoids a lineage-table read job per round; invalidated on
        # resume so the first round after a crash re-reads the durable row
        self._offsets_cache: dict[int, int] | None = None
        # memoized input DataFrames (immutable parquet inputs): building
        # them once avoids a file-listing + plan-construction cost per
        # round
        self._input_dfs: dict[str, DataFrame] = {}
        # set after a round that scheduled nothing: the next round must
        # verify pending emptiness with a real probe instead of trusting
        # the manifest row-stat bound (see _pending_rows_bound)
        self._force_probe = False
        # lazily computed: does any seeded authority use post-fetch keys?
        self._postfetch: bool | None = None
        # per-bloom-table (m_bits, conservative max items/shard) carry
        self._bloom_meta: dict[str, tuple[int, int]] = {}

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
        self.documents.layout_readers["extract_v1"] = docs_from_extract_parts
        self.fetch_log = t("fetch_log", S.FETCH_LOG)
        self.lineage = t("lineage", S.LINEAGE)
        self.metrics = t("metrics", S.METRICS)

    # -- setup / resume -------------------------------------------------------

    def _input_df(self, key: str, schema, path: str) -> DataFrame:
        df = self._input_dfs.get(key)
        if df is None:
            df = self.spark.read.schema(schema).parquet(path)
            self._input_dfs[key] = df
        return df

    def seeds_df(self) -> DataFrame:
        return self._input_df("seeds", S.SEEDS, self.seeds_path)

    def pages_df(self) -> DataFrame:
        return self._input_df("pages", S.PAGES, self.pages_path)

    def robots_df(self) -> DataFrame:
        return self._input_df("robots", S.ROBOTS, self.robots_path)

    def frontier_view(self) -> DataFrame:
        """The logical frontier of the north rule: pending ∪ done."""
        return self.pending.read(self.spark).unionByName(
            self.done.read(self.spark)
        )

    def init(self) -> None:
        """Seed the frontier (round 0 commit point).  Bloom tables are
        created lazily by the first round whose frontier size crosses
        ``bloom_min_rows`` (built from the full tables at that point)."""
        if self.pending.current_snapshot_id() is not None:
            return
        seeded = self.pending.commit_delta(
            self.spark, adds=FR.seed_frontier(self.seeds_df()), note="seed"
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
        self._offsets_cache = None
        self._bloom_meta = {}
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

    def _pending_rows_bound(self) -> int | None:
        """Upper bound on visible pending rows from the manifest's part
        row statistics — no Spark job.  sum(add-part rows) minus
        sum(tombstone rows); tombstones are always derived from rows
        read out of pending, so each deletes >= 1 add row.

        Returns None when any ADD part predates the row-stat manifest
        format (legacy plain-string entries, which _entry_path keeps
        readable): counting those as 0 would UNDER-count and falsely
        report a drained frontier, so the caller must fall back to the
        real limit(1) probe (round-3 ADVICE).  Legacy tombstones are
        safe to count as 0 — that only over-counts."""
        from .tables import _entry_rows

        m = self.pending._manifest()
        adds = 0
        for e in m["parts"]:
            r = _entry_rows(e)
            if r is None:
                return None
            adds += r
        tombs = sum(_entry_rows(e) or 0 for e in m["delete_parts"])
        return adds - tombs

    def _has_postfetch(self) -> bool:
        """True iff any seeded authority defers X1 keying to the docpage
        (registry ``title_at_docpage`` — slovenia's flow).  One tiny
        distinct-collect per run, cached."""
        if self._postfetch is None:
            from .extract import REGISTRY

            auths = [
                r["authority"]
                for r in self.seeds_df().select("authority").distinct().collect()
            ]

            def flag(a: str) -> bool:
                prof = REGISTRY.get(a)
                if prof is None and "_" in a:
                    head, _, tail = a.rpartition("_")
                    if tail.isdigit():
                        prof = REGISTRY.get(head)
                # unknown authority: keep the subplan (safe superset)
                return True if prof is None else bool(prof.get("title_at_docpage"))

            self._postfetch = any(flag(a) for a in auths)
        return self._postfetch

    def _enqueued_total(self) -> int:
        """Total URLs ever enqueued (drives the Bloom activation
        threshold) — free from the in-memory offsets carry; one lineage
        read only on the first round after init/resume."""
        if self._offsets_cache is None:
            last = self.last_committed_round()
            if last is None:
                return 0
            self._offsets_cache = {
                int(r["partition_id"]): int(r["frontier_offset"])
                for r in (
                    self.lineage.read(self.spark)
                    .filter(F.col("round_id") == last)
                    .select("partition_id", "frontier_offset")
                    .collect()
                )
            }
        return sum(self._offsets_cache.values())

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

    def _local_df(self, rows, schema) -> DataFrame:
        """Single-partition DataFrame from driver-side rows.

        ``createDataFrame(rows)`` lands on defaultParallelism partitions
        (32 tiny files per commit), and ``.coalesce(1)`` on the Arrow
        local relation costs ~4 s per write on Spark 4.1 (it defeats the
        LocalTableScan fast path) — an explicit 1-slice parallelize is
        both the fastest variant measured and one file per commit.
        """
        return self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(rows, 1), schema
        )

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
            if self._offsets_cache is not None:
                offsets = dict(self._offsets_cache)
            else:
                for r in (
                    self.lineage.read(self.spark)
                    .filter(F.col("round_id") == round_id - 1)
                    .select("partition_id", "frontier_offset")
                    .collect()
                ):
                    offsets[int(r["partition_id"])] = int(r["frontier_offset"])
        for pid, n in (delta_by_shard or {}).items():
            offsets[pid] = offsets.get(pid, 0) + n
        self._offsets_cache = dict(offsets)
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
        df = self._local_df(
            rows,
            "round_id long, frontier_snapshot string, done_snapshot string, "
            "seen_snapshot string, documents_snapshot string, "
            "partition_id int, frontier_offset long, "
            "bloom_version long, fetched long, extracted long",
        ).withColumn("committed_ts", F.current_timestamp())
        self.lineage.append(df, note=f"round-{round_id}")

    def _bloom_commit(
        self,
        table: SnapshotTable,
        delta: DataFrame,
        full: DataFrame,
        note: str,
        est_new_per_shard: int = 0,
    ) -> None:
        """Merge ``delta`` url_hashes into a sharded Bloom table, growing
        it geometrically when any shard nears capacity (ROADMAP #7: a
        fixed 1<<20 bitset caps out at ~10^6 hashes/shard).

        Sizing state (per-shard m_bits + conservative item-count bound)
        is carried in memory between rounds and seeded from one 32-row
        stats read per run — the steady-state round pays zero extra
        jobs.  ``est_new_per_shard`` conservatively over-counts this
        delta (early resize is harmless; a LATE resize only raises FP
        rate, never correctness — the exact residue joins stay
        authoritative).  First activation (lazy threshold crossing) and
        resizes rebuild from ``full`` (all hashes) — an O(table) job
        that happens O(log n) times total, so amortized per-round cost
        stays O(round).
        """
        meta = self._bloom_meta.get(table.root)
        prior = table.read(self.spark) if table.current_snapshot_id() else None
        if meta is None:
            cur_m, max_n = SN.DEFAULT_M_BITS, 0
            if prior is not None:
                stats = prior.select(
                    (F.length("bits") * 8).alias("m"), "n_items"
                ).collect()
                if stats:
                    cur_m = max(int(r["m"]) for r in stats)
                    max_n = max(int(r["n_items"]) for r in stats)
        else:
            cur_m, max_n = meta
        max_n += est_new_per_shard
        target = SN.bloom_target_bits(max_n)
        if prior is None or target > cur_m:
            # first activation or resize: rebuild from the FULL hash set
            # so the filter is a superset of its base table from day one
            cur_m = max(cur_m, target)
            state = SN.bloom_build(
                self.spark, full, None, n_shards=self.n_shards, m_bits=cur_m
            )
        else:
            state = SN.bloom_build(
                self.spark, delta, prior, n_shards=self.n_shards, m_bits=cur_m
            )
        table.overwrite(state, note=note)
        self._bloom_meta[table.root] = (cur_m, max_n)

    # -- one round ------------------------------------------------------------

    def round(self, round_id: int) -> dict | None:
        """Run one micro-batch round; returns stats or None if frontier drained."""
        t0 = time.time()
        # phase wall-clock breakdown (SPARK_GRAFT_ROUND_TIMING=1): the
        # per-round fixed cost is the denominator of the whole-crawl
        # bench at small fixtures, so keep it measurable for free
        timing = os.environ.get("SPARK_GRAFT_ROUND_TIMING") == "1"
        phases: dict[str, float] = {}
        _last = [t0]

        def tick(name: str) -> None:
            if timing:
                now = time.time()
                phases[name] = round(now - _last[0], 3)
                _last[0] = now

        spark = self.spark
        pending_df = self.pending.read(spark)
        # manifest row statistics give an UPPER bound on visible pending
        # rows with zero Spark jobs (every tombstone row came from a row
        # scheduled out of pending, so it deletes at least one add row):
        # bound <= 0 proves the frontier is drained; bound > 0 skips the
        # per-round limit(1) probe job.  The one corner where the bound
        # over-counts (a tombstone key shadowing a duplicate-keyed later
        # add) is caught by _force_probe: a round that scheduled nothing
        # makes the next round verify with a real probe.
        bound = self._pending_rows_bound()
        if bound is not None and bound <= 0:
            return None
        if bound is None or self._force_probe:
            # legacy manifest without row stats, or a zero-schedule
            # round: trust only a real probe before declaring drained
            if pending_df.limit(1).count() == 0:
                return None
            self._force_probe = False
        tick("read_pending")

        # 1. pending persists for the round: it feeds the salt plan, the
        #    pre-prune AND every membership probe against "all pending
        #    rows", so the MoR reconciliation anti-join runs exactly
        #    once per round.  (Slim rows — ~200 B each; at
        #    10^10-frontier scale the cache spills to executor disk,
        #    which is still one materialization instead of six
        #    re-scans.)
        pending_slim = pending_df.persist(StorageLevel.MEMORY_AND_DISK)

        # 2. politeness schedule (R1) in salted per-host partitions,
        #    with the O(pending)-per-round terms pruned away (VERDICT
        #    round 2, what's-wrong #3): a map-side batch-local top-k
        #    cuts the rank window's input to O(budget x margin) rows per
        #    salt per partition, and the robots gate (R5 — broadcast
        #    join + pandas UDF) evaluates ONLY the pruned candidates.
        #    Rows pruned out — including any not-yet-discovered
        #    robots-denied rows — simply stay pending and surface in a
        #    later round when their (priority, seq) turn comes.
        budgets = FR.host_budgets(pending_slim, self.seeds_df(), self.round_seconds)
        plan = FR.salt_plan(pending_slim, budgets)
        # cost-based window skip: when no host's pending exceeds its
        # budget, the rank window admits everything — skip the O(round)
        # shuffle+sort AND the pre-prune pass feeding it (the wide-open
        # regime thousands of cold hosts advance in; one tiny plan
        # aggregate decides, like AQE's broadcast threshold)
        binding = FR.budgets_bind(plan)
        salted = FR.salt_rows(pending_slim, budgets, plan=plan)
        if binding:
            salted = FR.preprune(salted, margin=self.preprune_margin)
        flagged = FR.robots_flag(salted, self.robots_df()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        plan_cols = ("n_salts", "salt_budget", "budget", "host_salt")
        allowed = flagged.filter(F.col("__allowed")).drop("__allowed")
        denied = flagged.filter(~F.col("__allowed")).drop("__allowed", *plan_cols)
        sched_all = (
            FR.rank_budget(allowed) if binding else allowed.drop(*plan_cols)
        )
        if self.quota_budgets:
            # R3 quota gate on the politeness-scheduled set: deferred
            # rows are simply NOT scheduled (no tombstone), so they
            # remain in pending and re-enter scheduling next round
            bud = spark.createDataFrame(
                list(self.quota_budgets.items()),
                f"{self.quota_key} string, budget long",
            )
            sched_all, _deferred = FR.quota_gate(
                sched_all.withColumn("cost", F.lit(1).cast("long")),
                bud,
                key_col=self.quota_key,
            )
            sched_all = sched_all.drop("cost")
        scheduled = sched_all.persist(
            StorageLevel.MEMORY_AND_DISK
        )
        tick("plan_schedule")
        # count once: it both materializes the persist and gates the
        # broadcast hint (an unbounded round must degrade to a shuffle /
        # storage-partitioned join, not OOM the driver)
        n_sched = scheduled.count()
        tick("schedule_count")

        # 3. fetch = equi-join vs pages (S3/S4).  The html column is the
        #    heavy payload: a plain left join would sort-merge-SHUFFLE the
        #    whole pages side (IO-bound, does not scale with cores), so
        #    instead the *scheduled* side — one short row per URL in
        #    flight this round — broadcasts against the pages scan
        #    (inner, size-gated).  Misses (404s) fall out of the
        #    transitions LEFT JOIN below for free (a scheduled url with
        #    no doc/log output row was absent from pages) — the pages
        #    table is scanned exactly once per round and never shuffled,
        #    and no anti-join against it exists anywhere.  html never
        #    leaves the scan partition; it is consumed immediately by
        #    the extract stage.
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
        # payload columns at all (text_len carries their byte
        # accounting).  store_content=False is applied inside the UDF so
        # payload bytes never cross the Arrow boundary.
        #
        # The write is partitioned by destiny: ``sink=doc`` holds
        # exactly the rows the documents table will commit — BY RENAME
        # (adopt_part), not by reading the payload back and re-writing
        # it — and already carries their final keys and batch_id;
        # ``sink=rest`` holds children/log rows for the slim consumers.
        # (The reference also writes each document's bytes exactly once,
        # pygdpr/models/dpa/austria/__init__.py:127-148.)
        out_raw = hits.mapInArrow(
            make_fetch_extract(self.as_of, self.store_content), EXTRACT_OUT
        )
        is_doc_sink = (F.col("out_kind") == "doc") & F.col("doc_hash").isNotNull()
        link_idx = F.col("seq").bitwiseAND(F.lit(MAX_LINK))
        final_key = F.when(
            (F.col("depth") >= 2) & (link_idx > 1),
            F.concat(F.col("doc_hash"), F.lit("#"), link_idx.cast("string")),
        ).otherwise(F.col("doc_hash"))
        enriched = out_raw.select(
            "*",
            F.length("text").cast("long").alias("text_len"),
            F.when(is_doc_sink, final_key).alias("final_key"),
            F.lit(round_id).cast("long").alias("batch_id"),
            F.when(is_doc_sink, F.lit("doc")).otherwise(F.lit("rest")).alias("sink"),
        )
        scratch = os.path.join(self.state_dir, "scratch", f"round-{round_id}")
        enriched.write.partitionBy("sink").mode("overwrite").parquet(scratch)
        out_hits = spark.read.schema(SCRATCH_OUT).parquet(scratch)
        tick("fetch_extract")

        # 4a. expansion: depth-0 listing children — URL-level dedupe
        #     (Pagination.add_item + page_list memo, P5): above the
        #     bloom_min_rows threshold the sharded url Bloom clears
        #     definitely-new urls without touching the frontier and the
        #     residue is verified with a probe-shaped anti-join
        #     (frontier scanned, never shuffled); below it the exact
        #     probe joins run alone (cost-based choice — the Bloom
        #     cogroup stages only pay off once the exact side is big)
        bloom_active = (
            self.use_bloom and self._enqueued_total() >= self.bloom_min_rows
        )
        url_bloom_state = (
            self.url_bloom.read(spark)
            if bloom_active and self.url_bloom.current_snapshot_id() is not None
            else None
        )
        seen_bloom_state = (
            self.bloom.read(spark)
            if bloom_active and self.bloom.current_snapshot_id() is not None
            else None
        )
        # "all enqueued" membership sources reuse the persisted pending
        # frame — no second MoR reconciliation scan
        done_df = self.done.read(spark)
        enqueued_urls = pending_slim.select("url_hash").unionByName(
            done_df.select("url_hash")
        )
        depth1_enqueued = pending_slim.filter(F.col("depth") == 1).unionByName(
            done_df.filter(F.col("depth") == 1)
        )
        # misses never produce children, so expansion reads hits only
        children = out_hits.filter(F.col("out_kind") == "child")

        # 4a+4c in ONE dedupe pass (one Bloom cogroup + one residue
        # probe per round instead of two): depth-0 listing children with
        # fresh keys ∪ depth>=2 file/redirect children with inherited
        # keys (depth 3 = EDPB alert-redirect pdf) ∪ title-less depth-1
        # children of post-fetch-keyed profiles (slovenia — admitted by
        # URL alone; X1 keying happens after their docpage fetch)
        url_kids = self._to_frontier_rows(
            children.filter(F.col("depth") == 0)
        ).unionByName(
            self._to_frontier_rows(
                children.filter(F.col("depth") >= 2), keep_keys=True
            )
        )
        if self._has_postfetch():
            url_kids = url_kids.unionByName(
                self._to_frontier_rows(
                    children.filter(
                        (F.col("depth") == 1) & F.col("title").isNull()
                    )
                )
            )
        url_children = SN.dedupe_against_seen(
            url_kids.dropDuplicates(["url_hash"]),
            enqueued_urls,
            url_bloom_state,
        )

        # 4b. expansion: depth-1 document candidates — X1 key + P3/P4
        cand = (
            children.filter((F.col("depth") == 1) & F.col("title").isNotNull())
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

        new_rows = url_children.unionByName(admitted)

        # 5. documents: depth-1 doc rows + decoded depth-2 files; within a
        #    docpage, files >1 get '#<link_idx>' keys (fixtures oracle).
        #    The ``sink=doc`` scratch partition IS this set, final keys
        #    included — the table adopts its files by rename after the
        #    commit window below (no payload read-back, no re-write).
        # post-fetch-keyed docs (slovenia): the title — and therefore the
        # X1 md5 key — only exists after the docpage fetch
        # (slovenia/__init__.py:179-189).  Key now, then admit: first
        # occurrence per raw key by seq wins within the round, and keys
        # already in `seen` (prior rounds of this run = the reference's
        # repeated-folder overwrite collapsed to first-wins; prior runs =
        # P3 existing_docs) are skipped.  Probe-shaped anti-join: seen is
        # scanned, never shuffled.  The whole subplan (window + probe,
        # re-evaluated inside both the documents and seen writes) is
        # built only when a seeded authority actually defers keying to
        # the docpage — only such profiles emit keyless titled doc rows.
        post = None
        if self._has_postfetch():
            w_post = Window.partitionBy("doc_hash").orderBy("seq")
            post = (
                out_hits.filter(
                    (F.col("out_kind") == "doc")
                    & F.col("doc_hash").isNull()
                    & F.col("title").isNotNull()
                )
                .withColumn("raw_hash", F.md5(F.encode(F.col("title"), "UTF-8")))
                .withColumn("doc_hash", F.col("raw_hash"))
                .withColumn("__rn", F.row_number().over(w_post))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            post = SN.anti_join_probe(
                post, self.seen.read(spark).select("doc_hash"), "doc_hash"
            ).withColumn("final_key", F.col("doc_hash"))
        post_doc_rows = (
            post.select(
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
            if post is not None
            else None
        )

        # 6. seen delta: every depth-1 docpage fetched OK registers its
        #    final key (oracle: run_final_keys.add after docpage fetch);
        #    post-fetch-keyed docs register at admission time
        seen_delta = (
            out_hits.filter(
                (F.col("depth") == 1)
                & (F.col("status") == "ok")
                & (F.col("out_kind").isin("doc", "log"))
                & F.col("doc_hash").isNotNull()
            )
            .select("doc_hash", "raw_hash", "release_date", "seq")
        )
        if post is not None:
            seen_delta = seen_delta.unionByName(
                post.select("doc_hash", "raw_hash", "release_date", "seq")
            )
        seen_delta = (
            seen_delta.distinct()
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
        #    Misses (P7) fall out of the left join for free: a scheduled
        #    url with no doc/log row in the round output was absent from
        #    pages — no anti-join, no synthesized rows.  sched_out is
        #    round-sized and slim; persisting it lets the done/log/
        #    re-pend/metrics consumers share ONE scratch scan + shuffle.
        attempt_status = (
            out_hits.filter(F.col("out_kind") != "child")
            .select(
                F.xxhash64(urls.canonicalize_simple(F.col("url"))).alias(
                    "url_hash"
                ),
                "status",
                F.col("text_len").alias("bytes"),
            )
            .dropDuplicates(["url_hash"])
        )
        sched_out = (
            scheduled.join(F.broadcast(attempt_status), "url_hash", "left")
            .withColumn("status", F.coalesce(F.col("status"), F.lit("miss")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        fr_cols = [f.name for f in S.FRONTIER.fields]

        def _with_state(df: DataFrame, state: str) -> DataFrame:
            return df.withColumn("state", F.lit(state)).select(*fr_cols)

        can_retry = F.col("retry_count") + 1 < F.lit(self.max_attempts)
        is_miss = F.col("status") == "miss"
        repend_rows = _with_state(
            sched_out.filter(is_miss & can_retry).withColumn(
                "retry_count", F.col("retry_count") + 1
            ),
            "pending",
        )
        # one branch for all terminal scheduled rows (ok -> fetched,
        # anything else -> failed) instead of a 3-way union — same rows,
        # smaller plan
        terminal = (
            sched_out.filter(~(is_miss & can_retry))
            .withColumn(
                "state",
                F.when(F.col("status") == "ok", F.lit("fetched")).otherwise(
                    F.lit("failed")
                ),
            )
            .select(*fr_cols)
        )
        done_delta = terminal.unionByName(_with_state(denied, "failed"))
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

        # -- stats ------------------------------------------------------------
        # n_docs comes from the metrics aggregation (collected below —
        # no separate count job over the heavy round output)
        n_seen = None if self.light_stats else seen_delta.count()

        # per-authority metrics = hits aggregation (expanded/doc/bytes
        # from one column-pruned scratch scan) merged with the miss
        # counts from the persisted sched_out — no union plan, no second
        # heavy scan
        hit_agg = out_hits.groupBy("authority").agg(
            F.sum(F.when(F.col("out_kind") == "child", 1).otherwise(0)).alias(
                "expanded"
            ),
            F.sum(F.when(F.col("out_kind") == "doc", 1).otherwise(0)).alias(
                "fetched"
            ),
            F.sum(
                F.when(
                    (F.col("out_kind") != "child") & (F.col("status") != "ok"), 1
                ).otherwise(0)
            ).alias("failed_hits"),
            F.sum(
                F.when(F.col("out_kind").isin("doc", "log"), 1).otherwise(0)
            ).alias("sched_hits"),
            F.sum(
                F.when(F.col("text_len").isNotNull(), F.col("text_len")).otherwise(0)
            ).alias("bytes_extracted"),
        )
        miss_agg = (
            sched_out.filter(F.col("status") == "miss")
            .groupBy("authority")
            .agg(F.count("*").alias("n_miss"))
        )
        met = (
            hit_agg.join(miss_agg, "authority", "full_outer")
            .na.fill({"expanded": 0, "fetched": 0, "failed_hits": 0,
                      "sched_hits": 0, "bytes_extracted": 0, "n_miss": 0})
            .select(
                F.lit(round_id).cast("long").alias("round_id"),
                "authority",
                F.lit("*").alias("host"),
                F.col("expanded").cast("long"),
                F.lit(0).cast("long").alias("deduped"),
                (F.col("sched_hits") + F.col("n_miss")).cast("long").alias(
                    "scheduled"
                ),
                F.col("fetched").cast("long"),
                (F.col("failed_hits") + F.col("n_miss")).cast("long").alias(
                    "failed"
                ),
                F.col("bytes_extracted").cast("long"),
                F.lit(int((time.time() - t0) * 1000)).cast("long").alias("wall_ms"),
            )
        )

        # -- commits (lineage last = commit point) ----------------------------
        # The five data-table writes have independent DAGs (all rooted in
        # the materialized scratch + the persisted scheduled/flagged/
        # sched_out frames), so they run as CONCURRENT Spark jobs — round
        # wall pays max(write) instead of sum(write).  Crash consistency
        # is unchanged: resume only trusts tables up to the lineage row,
        # which still commits strictly last on the driver thread.
        from concurrent.futures import ThreadPoolExecutor

        note = f"round-{round_id}"
        tick("plan_outputs")
        try:
            with ThreadPoolExecutor(max_workers=8) as ex:
                # the metrics aggregation doubles as the round's doc
                # count — one job, collected concurrently with the writes
                f_met = ex.submit(met.collect)
                # documents: only the (rare) post-fetch-keyed rows need a
                # real write — the bulk doc payload is adopted from the
                # scratch partition by rename once every consumer of the
                # scratch files has finished scanning them (below)
                f_docs = (
                    ex.submit(self.documents.append, post_doc_rows, note)
                    if post_doc_rows is not None
                    else None
                )
                f_seen = ex.submit(
                    self.seen.append_read, spark, seen_delta, note
                )
                f_log = ex.submit(self.fetch_log.append, log_rows, note)
                f_pend = ex.submit(
                    self.pending.commit_delta, spark, adds, tombstones, note
                )
                f_done = ex.submit(self.done.append, done_delta, note)
                met_rows = f_met.result()
                n_docs = int(sum(r["fetched"] for r in met_rows))
                # metrics write + per-shard add counts join the same
                # concurrent window as soon as their inputs exist —
                # lineage alone stays strictly last
                f_metrics = ex.submit(
                    self.metrics.append, self._local_df(met_rows, S.METRICS), note
                )
                add_read = f_pend.result()
                f_shards = ex.submit(
                    self._shard_counts,
                    add_read.filter(F.col("retry_count") == 0),
                )
                if f_docs is not None:
                    f_docs.result()
                _, seen_read = f_seen.result()
                f_log.result()
                f_done.result()
                delta_by_shard = f_shards.result()
                f_metrics.result()
            n_new = sum(delta_by_shard.values())
            # adopt the round's doc payload into the documents table by
            # RENAME — driver-side metadata only (footer row counts +
            # manifest append).  Strictly after the commit window: every
            # Spark job scanning the scratch files has completed, so no
            # task can race the rename; strictly before lineage, which
            # records the documents snapshot id.  A zero-doc round
            # writes no ``sink=doc`` partition — nothing to adopt.
            doc_part_dir = os.path.join(scratch, "sink=doc")
            if os.path.isdir(doc_part_dir):
                self.documents.adopt_part(doc_part_dir, note, "extract_v1")
            tick("commits")
            if bloom_active:
                self._bloom_commit(
                    self.bloom,
                    delta=seen_read.select("url_hash"),
                    full=self.seen.read(spark).select("url_hash"),
                    note=note,
                    # n_docs >= distinct new seen keys; 2x for shard skew
                    est_new_per_shard=(2 * n_docs) // self.n_shards + 1,
                )
                self._bloom_commit(
                    self.url_bloom,
                    delta=add_read.select("url_hash"),
                    full=self.frontier_view().select("url_hash"),
                    note=note,
                    est_new_per_shard=max(delta_by_shard.values(), default=0) + 1,
                )
            tick("blooms_shards")
            self._commit_lineage(
                round_id, fetched=n_sched, extracted=n_docs,
                delta_by_shard=delta_by_shard,
            )
            self._force_probe = n_sched == 0
            tick("metrics_lineage")
        finally:
            scheduled.unpersist()
            flagged.unpersist()
            pending_slim.unpersist()
            sched_out.unpersist()
            shutil.rmtree(scratch, ignore_errors=True)
        st = {
            "round": round_id,
            "scheduled": n_sched,
            "docs": n_docs,
            "new_frontier_rows": n_new,
            "seen_delta": n_seen,
            "wall_s": time.time() - t0,
        }
        if timing:
            st["phases"] = phases
        return st

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
