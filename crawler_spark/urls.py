"""URL layer: canonicalization, hashing, identity keys (SURVEY.md §2 F7/X1).

Reference behavior re-expressed:

- relative-vs-absolute resolution ``host + href`` vs ``http`` passthrough
  (``pygdpr/models/dpa/edpb/__init__.py:254-257,336-339``;
  ``pygdpr/models/dpa/austria/__init__.py:104-111``) — generalized into a
  real canonicalizer (scheme/host lowercase, resolve relative, strip
  fragments, drop default ports, normalize dot-segments) implemented as an
  Arrow-vectorized ``pandas_udf`` (no per-row Python UDFs).
- identity key = md5 hexdigest of the document *title*
  (``pygdpr/models/dpa/austria/__init__.py:99`` and all 29 scrapers) —
  Spark's built-in ``md5(encode(title,'UTF-8'))`` is byte-identical to
  ``hashlib.md5`` for UTF-8 input (pytest-verified in tests/test_urls.py).
- ``url_hash`` — 64-bit ``xxhash64`` of the canonical URL (the frontier
  key at 10^10-URL scale; 32-bit murmur3 would collide ~1% at 10^10).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_one(href: str, base: str | None = None) -> str | None:
    """Canonical absolute URL (plain-Python core, shared with the oracle)."""
    if href is None:
        return None
    url = urljoin(base, href.strip()) if base else href.strip()
    s = urlsplit(url)
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    # normalize dot-segments (RFC 3986 §5.2.4)
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if segs:
                segs.pop()
        elif seg != ".":
            segs.append(seg)
    path = "/".join(segs)
    if not path.startswith("/"):
        path = "/" + path
    return urlunsplit((scheme, netloc, path, s.query, ""))  # fragment dropped


@pandas_udf(StringType())
def canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    """Arrow-vectorized canonicalizer: resolve ``href`` against ``base``."""
    return pd.Series(
        [canonicalize_one(h, b) for h, b in zip(href, base)], dtype="object"
    )


def canonicalize_simple(url: Column) -> Column:
    """SQL-expressible canonical subset (lowercase scheme+host, strip
    fragment, drop default port) — used by oracle-checked queries so the
    DuckDB oracle can reproduce it exactly; the full canonicalizer above
    covers relative resolution + dot-segments inside the engine."""
    c = F.regexp_replace(url, r"#.*$", "")  # strip fragment
    # lowercase scheme://host prefix, keep path/query case
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    c = F.regexp_replace(c, r"^(https://[^/?#]*):443(?=[/?]|$)", r"$1")
    c = F.regexp_replace(c, r"^(http://[^/?#]*):80(?=[/?]|$)", r"$1")
    return c


def host_of(url: Column) -> Column:
    """Lowercased host of a URL (partitioning key for politeness)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))


def url_hash(url: Column) -> Column:
    """64-bit frontier key of the canonical URL."""
    return F.xxhash64(url)


def doc_key(title: Column) -> Column:
    """md5(title) hexdigest — the reference's document identity key
    (pygdpr/models/dpa/austria/__init__.py:99), byte-identical to hashlib."""
    return F.md5(F.encode(title, "UTF-8"))
