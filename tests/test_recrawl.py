"""Adaptive recrawl scheduling (frontier.recrawl_schedule): the Cho &
Garcia-Molina estimator against hand-computed values, the parked
branches (never-changed, single-visit), and both interval clamps."""

from __future__ import annotations

import math

from crawler_spark.frontier import recrawl_schedule

US_PER_DAY = 86_400_000_000


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, ts_us long, changed boolean")
    return {r["url"]: r for r in recrawl_schedule(df).collect()}


def test_estimator_matches_hand_computation(spark):
    rows = [
        ("A", 0, False),
        ("A", 10 * US_PER_DAY, True),
        ("A", 20 * US_PER_DAY, True),
    ]
    got = _run(spark, rows)["A"]
    n, x, span = 3.0, 2.0, 20.0
    r = -math.log((n - x + 0.5) / (n + 0.5))
    lam = r * (n - 1) / span
    assert got["n_visits"] == 3 and got["n_changed"] == 2
    assert got["lambda_per_day"] == round(lam, 6)
    assert got["interval_days"] == round(1.0 / lam, 6)


def test_parked_branches(spark):
    rows = [
        ("never", 0, False),
        ("never", 5 * US_PER_DAY, False),
        ("once", 3 * US_PER_DAY, True),
    ]
    got = _run(spark, rows)
    assert got["never"]["lambda_per_day"] == 0.0
    assert got["never"]["interval_days"] == 30.0
    assert got["once"]["n_visits"] == 1
    assert got["once"]["interval_days"] == 30.0


def test_interval_clamps(spark):
    hour = US_PER_DAY // 24
    fast = [("fast", i * hour, True) for i in range(5)]  # changes hourly
    slow = [("slow", i * 365 * US_PER_DAY, i == 1) for i in range(3)]
    got = _run(spark, fast + slow)
    assert got["fast"]["interval_days"] == 0.25  # min clamp
    assert got["slow"]["interval_days"] == 30.0  # max clamp
