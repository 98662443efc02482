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


def test_redirect_resolve_matches_python_spec(spark):
    """Random functional graph (each src has ONE outgoing edge; mixed
    chains, merges, cycles, self-loops absent by construction): the
    pointer-doubling resolver must agree with a pure-Python pointer
    walk capped at 2^4 hops for every source node."""
    from crawler_spark.urls import resolve_redirects

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(60)]
    edges = {}
    for s in nodes[:45]:
        d = rng.choice(nodes)
        if d != s:
            edges[s] = d
    cap = 16

    def walk(u):
        cur, hops = edges[u], 1
        while cur in edges and hops < cap:
            cur = edges[cur]
            hops += 1
        status = "loop" if cur in edges else "ok"
        return cur, hops, status

    d = spark.createDataFrame(list(edges.items()), "src string, dst string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["status"])
        for r in resolve_redirects(d, max_doublings=4).collect()
    }
    assert set(got) == set(edges)
    for u in edges:
        exp_final, exp_hops, exp_status = walk(u)
        g_final, g_hops, g_status = got[u]
        assert g_status == exp_status, (u, got[u], walk(u))
        if exp_status == "ok":
            assert (g_final, g_hops) == (exp_final, exp_hops), (u, got[u], walk(u))


def test_hll_distinct_error_bound_random_corpora(spark):
    """HLL p=9 over random vocab sizes: every group estimate within
    5 standard errors (1.04/sqrt(512) ~ 4.6% -> 23%) of exact, and the
    estimate is exactly reproducible run to run."""
    rng = random.Random(11)
    rows = []
    gid = 0
    for n_vocab in (30, 300, 1500):
        words = [f"w{gid}_{j}" for j in range(n_vocab)]
        for i in range(400):
            rows.append(
                (gid * 1000 + i, " ".join(rng.choices(words, k=12)), f"g{gid}")
            )
        gid += 1
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out1 = {r["source"]: r for r in corpus.hll_distinct(d).collect()}
    out2 = {r["source"]: r["n_est"] for r in corpus.hll_distinct(d).collect()}
    for g, r in out1.items():
        assert abs(r["n_est"] - r["n_exact"]) / r["n_exact"] < 0.23, (g, dict(r.asDict()))
        assert out2[g] == r["n_est"]
