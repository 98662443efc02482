"""Randomized equivalence: Spark corpus operators vs independent
pure-Python reference implementations of the same specs.

Seeded random corpus (plus adversarial edge cases: empty text,
whitespace-only, single token, unicode, heavy repetition) — one Spark
pass per operator, exact comparison against the python spec.
"""

import hashlib
import random

import pytest

from crawler_spark import corpus

VOCAB = [
    "the", "quick", "brown", "fox", "dog", "data", "spark", "crawl",
    "frontier", "seen", "host", "token", "bucket", "robots", "über",
    "køb", "naïve", "东京", "page", "fetch",
]


def h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def tokens_of(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


def shingles3(text: str) -> set[str]:
    t = tokens_of(text)
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(42)
    rows = [(i, " ".join(rng.choices(VOCAB, k=rng.randint(0, 40)))) for i in range(40)]
    rows += [
        (100, ""),
        (101, "   "),
        (102, "solo"),
        (103, "rep rep rep rep rep rep rep rep"),
        (104, "Über Køb NAÏVE 东京 mixed Case"),
        (105, rows[3][1]),  # exact duplicate of doc 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), dict(rows)


def test_exact_dedup_matches_spec(docs):
    df, raw = docs
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in corpus.exact_dedup(df).collect()}
    groups: dict[str, list[int]] = {}
    for did, text in raw.items():
        groups.setdefault(hashlib.md5(text.encode()).hexdigest(), []).append(did)
    for h, ids in groups.items():
        for did in ids:
            assert got[did] == (min(ids), len(ids))


def test_ngram_jaccard_matches_spec(docs):
    df, raw = docs
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in corpus.ngram_jaccard_pairs(df, threshold=0.05).collect()}
    ids = sorted(raw)
    want = {}
    for i, a in enumerate(ids):
        sa = shingles3(raw[a])
        if not sa:
            continue
        for b in ids[i + 1:]:
            sb = shingles3(raw[b])
            if not sb:
                continue
            inter = len(sa & sb)
            if inter:
                j = round(inter / (len(sa) + len(sb) - inter), 4)
                if j >= 0.05:
                    want[(a, b)] = j
    assert got == want


def test_simhash_matches_spec(docs):
    df, raw = docs
    got = {r["doc_id"]: r["simhash"] for r in corpus.simhash(df).collect()}

    def ref(text: str) -> int:
        toks = tokens_of(text)
        out = 0
        for b in range(32):
            votes = sum(((h64(w) >> b) & 1) * 2 - 1 for w in toks)
            if votes > 0:
                out |= 1 << b
        return out

    for did, text in raw.items():
        if tokens_of(text):
            assert got[did] == ref(text), did
        else:
            assert did not in got


def test_winnow_matches_spec(docs):
    df, raw = docs
    got: dict[int, set[int]] = {}
    for r in corpus.winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    def ref(text: str) -> set[int]:
        t = tokens_of(text)
        hs = [h64(" ".join(t[i : i + 5])) for i in range(len(t) - 4)]
        if not hs:
            return set()
        n_win = max(len(hs) - 3, 1)
        return {min(hs[i : i + 4]) for i in range(n_win)}

    for did, text in raw.items():
        expect = ref(text)
        if expect:
            assert got[did] == expect, did
        else:
            assert did not in got


def test_token_stats_matches_spec(docs):
    df, raw = docs
    got = {r["doc_id"]: r["ws_tokens"] for r in corpus.token_stats(df).collect()}
    for did, text in raw.items():
        assert got[did] == len(tokens_of(text)), did
