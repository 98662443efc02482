"""End-to-end crawl equivalence: distributed engine ≡ sequential oracle.

The oracle (crawler_spark.fixtures.sequential_oracle) replays the
reference's exact loop order (Pagination cursor, P1-P7 predicates, X1-X7
extraction — SURVEY.md §3.3).  The engine runs the same fixtures through
micro-batch rounds on local[8].  Asserts:

1. identical final seen-set,
2. identical crawl order under ``ORDER BY seq`` (url sequence),
3. **byte-identical extracted text per url** (BASELINE.json input_hint),
4. per-host politeness budgets never exceeded in any round,
5. robots-denied urls never fetched.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.fixtures import AS_OF, fixture_dir, sequential_oracle
from crawler_spark.rounds import CrawlRun


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    fix = fixture_dir("sf0.001")
    state = str(tmp_path_factory.mktemp("crawl_state"))
    run = CrawlRun(
        spark,
        state_dir=state,
        pages_path=os.path.join(fix, "pages.parquet"),
        seeds_path=os.path.join(fix, "seeds.parquet"),
        robots_path=os.path.join(fix, "robots.parquet"),
        as_of=AS_OF,
        round_seconds=60.0,
    )
    stats = run.run(max_rounds=50)
    golden = sequential_oracle(fix, AS_OF)
    return run, stats, golden


def test_terminates_and_produces_docs(crawl):
    run, stats, golden = crawl
    assert len(stats) >= 3  # depth chain needs >=3 rounds
    assert len(golden["documents"]) > 0


def test_seen_set_matches_oracle(crawl):
    run, stats, golden = crawl
    engine_seen = {
        r["doc_hash"] for r in run.seen.read(run.spark).select("doc_hash").collect()
    }
    assert engine_seen == golden["seen"]


def test_crawl_order_matches_oracle(crawl):
    run, stats, golden = crawl
    eng = [
        (r["seq"], r["url"], r["doc_hash"])
        for r in run.documents.read(run.spark)
        .orderBy("seq")
        .select("seq", "url", "doc_hash")
        .collect()
    ]
    gold = [(d["seq"], d["url"], d["doc_hash"]) for d in golden["documents"]]
    assert eng == gold


def test_text_byte_identical(crawl):
    run, stats, golden = crawl
    eng = {
        r["url"]: r["text"]
        for r in run.documents.read(run.spark).select("url", "text").collect()
    }
    gold = {d["url"]: d["text"] for d in golden["documents"]}
    assert set(eng) == set(gold)
    for url, text in gold.items():
        assert eng[url] == text, f"text mismatch for {url}"
    # ground truth stored in pages.text must match too (generation-time
    # invariant — guards against extractor drift)
    pages = run.pages_df().filter(F.col("text").isNotNull())
    gt = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    for url, text in eng.items():
        if url in gt:
            assert text == gt[url]


def test_politeness_budget_never_exceeded(crawl):
    run, stats, golden = crawl
    # ireland has delay 5s -> budget 12/round at round_seconds=60
    log = run.fetch_log.read(run.spark)
    per_round_host = (
        log.groupBy("batch_id", "host").agg(F.count("*").alias("n")).collect()
    )
    from crawler_spark.fixtures import HOSTS

    for r in per_round_host:
        if r["host"] == HOSTS["ireland"]:
            assert r["n"] <= 12, f"budget exceeded: {r}"


def test_robots_denied_never_fetched(crawl):
    run, stats, golden = crawl
    log = run.fetch_log.read(run.spark)
    fetched_private = log.filter(F.col("url").contains("/private/")).count()
    docs_private = (
        run.documents.read(run.spark).filter(F.col("url").contains("/private/")).count()
    )
    assert fetched_private == 0 and docs_private == 0


def test_frontier_terminal_states(crawl):
    run, stats, golden = crawl
    # drained crawl: pending MoR set is empty, done log holds terminals
    assert run.pending.read(run.spark).count() == 0
    states = {
        r["state"]
        for r in run.frontier_view().select("state").distinct().collect()
    }
    assert "pending" not in states and "fetched" in states
