"""Semantic tests for ANN/similarity over a constructed embedding set."""

import math

import pytest

from crawler_spark import similarity


@pytest.fixture(scope="module")
def emb(spark):
    # vec 0 (query) has a near-clone at id 10, an opposite at id 11,
    # and orthogonal-ish noise elsewhere; dim 8
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = [1, -0.2, 0.3, -0.4, 1, -0.5, 0.6, -0.7]
    clone = [1.02, -0.21, 0.29, -0.41, 0.98, -0.49, 0.61, -0.69]
    rows = [
        (0, unit(base)),
        (10, unit(clone)),  # near clone, same sign pattern
        (11, unit([-x for x in base])),  # opposite
        (12, unit([-0.1, 1, -0.2, 0.5, -0.3, 1, -0.4, 0.2])),
        (13, unit([0.2, -0.3, -1, 1, 0.1, -0.2, -1, 1])),
        (14, unit([1, 1, 1, 1, 1, 1, 1, 1])),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_order(emb):
    out = similarity.cosine_topk(emb, n_queries=1, k=5).collect()
    ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 10  # clone first
    assert ranked[-1] == 11  # opposite last
    top = [r for r in out if r["rank"] == 1][0]
    assert top["cosine"] > 0.99


def test_lsh_bucket_contains_clone(emb):
    out = similarity.lsh_topk(emb, n_queries=1, k=5, n_bits=8).collect()
    ids = {r["vec_id"] for r in out}
    assert 10 in ids  # same sign pattern -> same bucket
    assert 11 not in ids  # opposite signs -> different bucket


def test_neardup_pairs_threshold(emb):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.neardup_pairs(emb, threshold=0.95).collect()
    }
    assert (0, 10) in pairs
    assert all(c >= 0.95 for c in pairs.values())


def test_ivf_recall_vs_bruteforce(spark):
    """IVF multi-probe recovers most of the exact top-k on real data."""
    emb_full = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb_full, n_queries=5, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            emb_full, n_queries=5, k=5, n_lists=8, n_probe=4
        ).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # deterministic across invocations (fixed KMeans seed)
    ivf2 = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            emb_full, n_queries=5, k=5, n_lists=8, n_probe=4
        ).collect()
    }
    assert ivf == ivf2


def test_parquet_row_count_matches_scan(spark):
    """Footer-only row count == full-scan count, and the hinted ivf_topk
    (the registered-query shape, no pre-fit count job) returns the same
    result as the hintless fallback."""
    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    n = similarity.parquet_row_count(path)
    assert n == emb.count()
    hinted = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivf_topk(
            emb, n_queries=5, k=5, n_lists=8, n_probe=4,
            n_cand_hint=max(n - 5, 1),
        ).collect()
    }
    plain = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivf_topk(
            emb, n_queries=5, k=5, n_lists=8, n_probe=4
        ).collect()
    }
    assert hinted == plain


def test_ivf_frozen_recall_and_zero_shuffle_assign(spark):
    """Frozen-quantizer IVF: decent recall vs brute force, and the
    candidate-side cell assignment is a pure projection (the only
    exchanges in the plan serve the final per-query rank window and the
    broadcast probe join, never a corpus re-partition for assignment)."""
    emb_full = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb_full, n_queries=5, k=5).collect()
    }
    ivf = similarity.ivf_topk_frozen(emb_full, n_queries=5, k=5, n_probe=4)
    got = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.55, f"frozen-IVF recall too low: {recall}"
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    # assignment itself adds no exchange: candidates flow
    # scan -> project(cell) -> broadcast-join; the only hash exchange in
    # the plan serves the per-query rank window (query_id), never a
    # corpus repartition by vec_id or cell
    assert "Exchange hashpartitioning(vec_id" not in plan, plan
    assert "Exchange hashpartitioning(cell" not in plan, plan
    assert "Exchange hashpartitioning(query_id" in plan
