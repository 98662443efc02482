"""Sharded Bloom seen-filter: no false negatives, bounded FP, anti-join parity."""

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.seen import (
    _bit_indexes,
    bloom_build,
    bloom_flag,
    dedupe_against_seen,
)


def _hashes_df(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "url_hash long")


def test_bloom_no_false_negatives(spark):
    rng = np.random.default_rng(42)
    members = rng.integers(-(2**62), 2**62, size=2000)
    state = bloom_build(spark, _hashes_df(spark, members), m_bits=1 << 16)
    flagged = bloom_flag(_hashes_df(spark, members), state, m_bits=1 << 16)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fp_rate_bounded(spark):
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=2000)
    others = rng.integers(-(2**62), 2**62, size=4000)
    others = np.setdiff1d(others, members)
    state = bloom_build(spark, _hashes_df(spark, members), m_bits=1 << 16)
    flagged = bloom_flag(_hashes_df(spark, others), state, m_bits=1 << 16)
    fp = flagged.filter(F.col("maybe_seen")).count() / len(others)
    assert fp < 0.01, f"FP rate {fp:.4f} too high"


def test_bloom_incremental_merge(spark):
    a = _hashes_df(spark, range(0, 1000))
    b = _hashes_df(spark, range(1000, 2000))
    s1 = bloom_build(spark, a, m_bits=1 << 16)
    s2 = bloom_build(spark, b, prior_state=s1, m_bits=1 << 16)
    flagged = bloom_flag(_hashes_df(spark, range(0, 2000)), s2, m_bits=1 << 16)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_dedupe_matches_plain_antijoin(spark):
    rng = np.random.default_rng(3)
    seen_vals = rng.integers(0, 10**9, size=3000)
    cand_vals = rng.integers(0, 10**9, size=1500)
    cand_vals = np.concatenate([cand_vals, seen_vals[:500]])  # overlap
    seen_df = _hashes_df(spark, seen_vals)
    cand_df = _hashes_df(spark, cand_vals).distinct()
    state = bloom_build(spark, seen_df, m_bits=1 << 16)
    exact = set(
        r[0]
        for r in dedupe_against_seen(cand_df, seen_df, bloom_state=None).collect()
    )
    with_bloom = set(
        r[0]
        for r in dedupe_against_seen(
            cand_df, seen_df, bloom_state=state, m_bits=1 << 16
        ).collect()
    )
    assert exact == with_bloom


def test_bit_indexes_deterministic():
    h = np.array([123456789, -987654321], dtype=np.int64)
    a = _bit_indexes(h, 1 << 16, 7)
    b = _bit_indexes(h, 1 << 16, 7)
    assert (a == b).all() and a.shape == (2, 7)
