"""New query-surface semantics: bool.should score boosting (B7), pagination
offset (B10), term-dictionary prefix match (B5), and the CLI dispatch (A31).
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.engine import ExactBM25
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 300, min_tokens=20, max_tokens=120, partitions=4)
    return assign_doc_ids(docs).cache()


@pytest.fixture(scope="module")
def exact(corpus):
    return ExactBM25(corpus, attr_cols=("repo", "path", "lang"), cache=True)


@pytest.fixture(scope="module")
def wand(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sop_idx"))
    build_index(
        spark, corpus, out, attr_cols=("repo", "path", "lang"),
        n_shards=4, block_size=16, salt_threshold=100, n_salts=4,
    )
    return CompressedIndex(spark, out)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ------------------------------------------------------------- should ----

def test_should_never_expands_match_set(exact):
    base = {r[0] for r in rows(exact.search("id0001", k=10**6))}
    boosted = {r[0] for r in rows(exact.search("id0001", k=10**6, should_text="def return"))}
    assert boosted == base


def test_should_only_increases_scores(exact):
    base = dict(rows(exact.search("def class", k=10**6)))
    boosted = dict(rows(exact.search("def class", k=10**6, should_text="lambda")))
    assert set(boosted) == set(base)
    assert all(boosted[d] >= base[d] for d in base)
    assert any(boosted[d] > base[d] for d in base)  # lambda does occur


def test_should_term_overlapping_must_counts_once(exact):
    a = rows(exact.search("def class", k=20))
    b = rows(exact.search("def class", k=20, should_text="def"))
    assert a == b


# ------------------------------------------------------------- offset ----

def test_offset_windows_tile_the_ranking(exact):
    full = rows(exact.search("def return import", k=30))
    p1 = rows(exact.search("def return import", k=10))
    p2 = rows(exact.search("def return import", k=10, offset=10))
    p3 = rows(exact.search("def return import", k=10, offset=20))
    assert p1 + p2 + p3 == full


def test_offset_past_end_is_empty(exact):
    assert rows(exact.search("id0001", k=10, offset=10_000)) == []


def test_wand_offset_matches_exact(exact, wand):
    for off in (0, 5, 17):
        assert rows(wand.search("def return", k=8, offset=off)) == rows(
            exact.search("def return", k=8, offset=off)
        )


# ------------------------------------------------------ search_after ----

def test_search_after_walk_equals_offset_walk(exact, wand):
    """Keyset pages must tile the ranking exactly like offset pages, on
    BOTH engine paths and through score ties (the corpus has them)."""
    q = "def return import"
    full = rows(exact.search(q, k=30))
    for eng in (exact, wand):
        pages, cur = [], None
        for _ in range(3):
            page = rows(
                eng.search(q, k=10) if cur is None
                else eng.search(q, k=10, search_after=cur)
            )
            pages += page
            cur = page[-1][1], page[-1][0]  # (score, doc_id) of last hit
        assert pages == full


def test_search_after_fastpath_rank_identical(exact, wand):
    q = "def return"
    p1 = rows(exact.search(q, k=10))
    cur = (p1[-1][1], p1[-1][0])
    want = rows(exact.search(q, k=10, search_after=cur))
    got_dist = rows(wand.search(q, k=10, search_after=cur))
    fp = wand.search_local(q, k=10, search_after=cur)
    got_fast = list(zip(fp["doc_id"].tolist(), fp["score"].tolist()))
    assert got_dist == want and got_fast == want


def test_search_after_with_filters_and_and(exact, wand):
    kw = dict(filters={"lang": "py"})
    p1 = rows(exact.search("def return", k=5, **kw))
    cur = (p1[-1][1], p1[-1][0])
    assert rows(wand.search("def return", k=5, search_after=cur, **kw)) == rows(
        exact.search("def return", k=5, search_after=cur, **kw)
    )
    p1 = rows(exact.search("def return", k=5, require_all=True))
    cur = (p1[-1][1], p1[-1][0])
    assert rows(
        wand.search("def return", k=5, search_after=cur, require_all=True)
    ) == rows(exact.search("def return", k=5, search_after=cur, require_all=True))


def test_search_after_past_end_empty_and_exclusive(exact, wand):
    assert rows(exact.search("id0001", k=10, search_after=(0.0, 10**9))) == []
    assert rows(wand.search("id0001", k=10, search_after=(0.0, 10**9))) == []
    for eng in (exact, wand):
        with pytest.raises(ValueError):
            eng.search("def", k=5, offset=3, search_after=(1.0, 0))


# ------------------------------------------------------- term prefix ----

def test_term_prefix_identity_exact_vs_wand(exact, wand):
    for p in ("de", "re", "id00", "zz_nope"):
        assert rows(wand.term_prefix_search(p, k=25)) == rows(
            exact.term_prefix_search(p, k=25)
        )


def test_term_prefix_semantics_against_postings(exact):
    got = {r[0] for r in rows(exact.term_prefix_search("imp", k=10**6))}
    want = {
        r["doc_id"]
        for r in exact.postings.where(F.col("term").startswith("imp"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got == want and len(want) > 0


def test_term_prefix_constant_score_and_order(exact):
    out = rows(exact.term_prefix_search("de", k=15))
    assert all(s == 1.0 for _, s in out)
    assert [d for d, _ in out] == sorted(d for d, _ in out)


# ----------------------------------------------------------------- CLI ----

def test_cli_health_and_build_and_search(tmp_path, corpus):
    src = str(tmp_path / "docs.parquet")
    corpus.withColumn("content_sha256", F.sha2(F.col("content"), 256)).write.parquet(src)
    idx = str(tmp_path / "idx")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "librecatastro_spark", "--cores", "2", *args],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]

    h = run("health", "--input", src, "--text-col", "content")[0]
    assert h["n_docs"] == 300

    b = run("build", "--input", src, "--out", idx, "--text-col", "content",
            "--attr-cols", "lang,content_sha256", "--shards", "4")[0]
    assert b["n_docs"] == 300

    s = run("search", "--index", idx, "--text", "def return", "--k", "5")
    assert len(s) == 5 and all("doc_id" in r for r in s)

    v = run("verify", "--input", src, "--index", idx, "--text-col", "content")[0]
    assert v["ok"] is True and v["n_mismatch"] == 0


# ----------------------------------------------------- field collapse ----

def test_collapse_rank_identical_and_semantics(exact, wand):
    """collapse_search: best doc per key, keys ranked by their best —
    rank-identical across engines and equal to a full-ranking replica."""
    for col, q in (("lang", "def return"), ("repo", "def return import")):
        e = [(r["doc_id"], r["score"], r["collapse_key"])
             for r in exact.collapse_search(q, col, k=8).collect()]
        w = [(r["doc_id"], r["score"], r["collapse_key"])
             for r in wand.collapse_search(q, col, k=8).collect()]
        assert e == w and len(e) > 0
        keys = [x[2] for x in e]
        assert len(keys) == len(set(keys))  # one hit per key
        # replica: full ranking joined to attrs, first hit per key
        full = rows(exact.search(q, k=10**6))
        key_of = {r["doc_id"]: r[col]
                  for r in exact.attrs.select("doc_id", col).collect()}
        seen, want = set(), []
        for d, s in full:
            kk = key_of[d]
            if kk not in seen:
                seen.add(kk)
                want.append((d, s, kk))
        assert e == want[:8]


def test_collapse_bad_column_raises(exact, wand):
    for eng in (exact, wand):
        with pytest.raises(ValueError):
            eng.collapse_search("def", "nosuchcol", k=5)


# ----------------------------------------------------- range / facets ----

def test_range_filter_rank_identical_all_paths(exact, wand):
    """ES range query: inclusive bounds, open ends, combined with
    equality filters — identical across exact, distributed and fast."""
    cases = [
        dict(ranges={"repo": ("org1", "org3")}),
        dict(ranges={"repo": (None, "org2")}),
        dict(ranges={"repo": ("org4", None)}, filters={"lang": "py"}),
    ]
    for kw in cases:
        want = rows(exact.search("def return", k=8, **kw))
        got = rows(wand.search("def return", k=8, **kw))
        fp = wand.search_local("def return", k=8, **kw)
        fast = list(zip(fp["doc_id"].tolist(), fp["score"].tolist()))
        assert got == want == fast and len(want) > 0


def test_range_bounds_inclusive(exact):
    # boundary values must be IN (ES range gte/lte default): a degenerate
    # [v, v] range equals the equality filter on a real attr value
    v = exact.attrs.select("repo").limit(1).collect()[0]["repo"]
    hit = {r[0] for r in rows(exact.search("def", k=10**6,
                                           ranges={"repo": (v, v)}))}
    want = {
        r["doc_id"] for r in exact.attrs.where(F.col("repo") == v)
        .select("doc_id").collect()
    } & {r[0] for r in rows(exact.search("def", k=10**6))}
    assert hit == want and hit


def test_facet_counts_exact_vs_wand_and_replica(exact, wand):
    for col in ("lang", "repo"):
        e = [(r["facet_key"], r["cnt"])
             for r in exact.facet_counts("def return", col, top_n=20).collect()]
        w = [(r["facet_key"], r["cnt"])
             for r in wand.facet_counts("def return", col, top_n=20).collect()]
        assert e == w and len(e) > 0
        # replica: count the full match set by key
        match = {r[0] for r in rows(exact.search("def return", k=10**6))}
        key_of = {r["doc_id"]: r[col]
                  for r in exact.attrs.select("doc_id", col).collect()}
        counts: dict[str, int] = {}
        for d in match:
            counts[key_of[d]] = counts.get(key_of[d], 0) + 1
        want = sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:20]
        assert e == want
        assert sum(c for _, c in counts.items()) == len(match)


def test_facet_bad_column_raises(exact, wand):
    for eng in (exact, wand):
        with pytest.raises(ValueError):
            eng.facet_counts("def", "nosuchcol")


def test_terms_filter_all_paths(exact, wand):
    """ES terms query: list filter value = col IN (...), identical across
    exact / distributed / fast, and equal to the union of equality runs."""
    kw = dict(filters={"lang": ["py", "go"]})
    want = rows(exact.search("def return", k=10, **kw))
    got = rows(wand.search("def return", k=10, **kw))
    fp = wand.search_local("def return", k=10, **kw)
    fast = list(zip(fp["doc_id"].tolist(), fp["score"].tolist()))
    assert got == want == fast and len(want) > 0
    by_union = {r[0] for r in rows(exact.search("def return", k=10**6,
                                                filters={"lang": "py"}))}
    by_union |= {r[0] for r in rows(exact.search("def return", k=10**6,
                                                 filters={"lang": "go"}))}
    full = {r[0] for r in rows(exact.search("def return", k=10**6, **kw))}
    assert full == by_union


def test_suggest_terms_matches_postings_df(exact, wand):
    """suggest_terms = top-k dictionary terms by df under a prefix; must
    equal a df count straight off the exact engine's postings."""
    got = [(r["term"], r["df"]) for r in wand.suggest_terms("re", k=8).collect()]
    want_df = (
        exact.postings.where(F.col("term").startswith("re"))
        .groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    )
    want = sorted(((r["term"], r["df"]) for r in want_df),
                  key=lambda x: (-x[1], x[0]))[:8]
    assert got == want and got
    with pytest.raises(ValueError):
        wand.suggest_terms("", k=5)
