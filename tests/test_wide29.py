"""Wide-fixture parity: clone authorities (the bench's wide/wide29
profiles) must crawl byte-identical to the sequential oracle across ALL
29 registry shapes.  This pins the clone-resolution path (base_auth,
per-clone hosts) that bench.py's crawl_e2e / crawl_e2e_29 depend on —
previously only the 5 base shapes ever ran as clones."""

from __future__ import annotations

import os
import tempfile

import pytest

from crawler_spark.fixtures import (
    AS_OF,
    generate,
    sequential_oracle,
    wide_all_authorities,
)
from crawler_spark.rounds import CrawlRun


@pytest.fixture(scope="module")
def wide29_fix(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wide29"))
    generate(out, n_pages=2, n_items=3, n_files=1,
             authorities=wide_all_authorities(1))
    return out


def test_wide29_clones_byte_identical(spark, wide29_fix):
    run = CrawlRun(
        spark,
        state_dir=tempfile.mkdtemp(),
        pages_path=os.path.join(wide29_fix, "pages.parquet"),
        seeds_path=os.path.join(wide29_fix, "seeds.parquet"),
        robots_path=os.path.join(wide29_fix, "robots.parquet"),
        as_of=AS_OF,
        round_seconds=3600.0,
    )
    run.run(max_rounds=50)
    golden = sequential_oracle(wide29_fix, AS_OF)
    docs = run.documents.read(spark)
    eng = [
        (r["seq"], r["url"])
        for r in docs.orderBy("seq").select("seq", "url").collect()
    ]
    want = [(d["seq"], d["url"]) for d in golden["documents"]]
    assert eng == want
    texts = {r["url"]: r["text"] for r in docs.select("url", "text").collect()}
    for d in golden["documents"]:
        assert texts[d["url"]] == d["text"], d["url"]
    # every clone authority produced at least one document
    auths = {r["authority"] for r in docs.select("authority").distinct().collect()}
    missing = set(wide_all_authorities(1)) - auths
    # germany-style empty profiles would show here; all 29 shapes emit docs
    assert not missing, f"clone shapes with no documents: {sorted(missing)}"
