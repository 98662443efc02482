#!/usr/bin/env python
"""Spark-free probe of the single-box scaling ceiling (BASELINE.md §2).

Runs two workloads under plain multiprocessing at 8 and 32 processes:

- a cache-resident md5 loop (no memory pressure) — shows the box CAN
  scale compute near-linearly;
- the crawl's actual inner loop (12 KB html -> mini-DOM -> get_text) —
  allocation-heavy, streams one page per iteration through the shared
  memory system.

If the second scales far worse than the first, the whole-crawl N->4N
efficiency is bounded by the shared memory controller, not by the
engine.  Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark import extract as X  # noqa: E402
from crawler_spark.fixtures import _docpage_html  # noqa: E402
from crawler_spark.htmlparse import parse_html  # noqa: E402

HTML = _docpage_html("austria", 1, 1, 0, 120)  # ~12 KB realistic page


def work_parse(n: int) -> int:
    """Round-2 inner loop: full mini-DOM build + get_text."""
    t = 0
    for _ in range(n):
        t += len(parse_html(HTML).get_text())
    return t


def work_stream(n: int) -> int:
    """Round-3 inner loop: single-pass selector-directed scanner — the
    path the engine's extract stage actually runs now."""
    t = 0
    for _ in range(n):
        t += len(X.parse_docpage("austria", "https://x/a.html", HTML)["text"])
    return t


def work_md5(n: int) -> int:
    h = b"x" * 4096
    for _ in range(n):
        h = hashlib.md5(h).digest() * 256
    return len(h)


def bench(fn, n_per: int, procs: int) -> float:
    with Pool(procs) as p:
        t0 = time.time()
        p.map(fn, [n_per] * procs)
        return procs * n_per / (time.time() - t0)


def main() -> None:
    lo, hi = (int(x) for x in
              os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(","))
    assert hi == 4 * lo, "levels must be a 4x pair (N, 4N)"
    out = {"levels": [lo, hi]}
    for name, fn, n in (
        ("md5_cache_resident", work_md5, 20_000),
        ("html_parse_12kb", work_parse, 1_200),
        ("html_stream_12kb", work_stream, 4_000),
    ):
        r8, r32 = bench(fn, n, lo), bench(fn, n, hi)
        out[name] = {
            f"rate_{lo}p": round(r8, 1),
            f"rate_{hi}p": round(r32, 1),
            "efficiency": round((r32 / r8) / 4, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
