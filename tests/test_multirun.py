"""P3 across runs: a later run skips documents whose RAW md5-title key
is a final key from a previous run — the reference's visitedDocs.txt
behavior (gdprCrawler.py:103-121 read at startup; skip at e.g.
pygdpr/models/dpa/austria/__init__.py:100-103).

Run 2 gets a FRESH frontier (new CLI invocation) but inherits run 1's
seen table; the engine must reproduce the sequential oracle run with
``persistent_seen`` set to run 1's key set — including the partial-seen
case where only some keys carry over.
"""

import os

from pyspark.sql import functions as F

from crawler_spark.fixtures import AS_OF, fixture_dir, sequential_oracle
from crawler_spark.rounds import CrawlRun


def _mk(spark, state_dir, fix, **kw):
    return CrawlRun(
        spark,
        state_dir=str(state_dir),
        pages_path=os.path.join(fix, "pages.parquet"),
        seeds_path=os.path.join(fix, "seeds.parquet"),
        robots_path=os.path.join(fix, "robots.parquet"),
        as_of=AS_OF,
        **kw,
    )


def _docs(run):
    return sorted(
        (r["seq"], r["url"], r["doc_hash"])
        for r in run.documents.read(run.spark)
        .select("seq", "url", "doc_hash")
        .collect()
    )


def test_second_run_skips_all_seen(spark, tmp_path):
    fix = fixture_dir("sf0.001")
    run1 = _mk(spark, tmp_path / "r1", fix, run_id=1)
    run1.run(max_rounds=30)
    assert len(_docs(run1)) > 0

    # run 2: fresh frontier, inherited seen table
    run2 = _mk(spark, tmp_path / "r2", fix, run_id=2)
    run2.seen.overwrite(run1.seen.read(spark), note="carry-from-run1")
    run2.run(max_rounds=30)
    assert _docs(run2) == []  # every candidate's raw key is a prior final

    g = sequential_oracle(
        fix, AS_OF,
        persistent_seen={r["doc_hash"] for r in run1.seen.read(spark).collect()},
    )
    assert g["documents"] == []


def test_second_run_with_partial_seen_matches_oracle(spark, tmp_path):
    fix = fixture_dir("sf0.001")
    run1 = _mk(spark, tmp_path / "p1", fix, run_id=1)
    run1.run(max_rounds=30)
    keys = {r["doc_hash"] for r in run1.seen.read(spark).collect()}
    carried = {k for k in keys if k[0] < "8"}  # deterministic half
    assert 0 < len(carried) < len(keys)

    run2 = _mk(spark, tmp_path / "p2", fix, run_id=2)
    run2.seen.overwrite(
        run1.seen.read(spark).filter(F.col("doc_hash") < "8"),
        note="partial-carry",
    )
    run2.run(max_rounds=30)

    g = sequential_oracle(fix, AS_OF, persistent_seen=carried)
    eng = [(s, u, h) for s, u, h in _docs(run2)]
    gold = [(d["seq"], d["url"], d["doc_hash"]) for d in g["documents"]]
    assert sorted(eng) == sorted(gold)
    assert len(gold) > 0  # the uncarried half really was re-crawled
