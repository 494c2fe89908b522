"""Coordinator fast path (CompressedIndex.search_local): rank-identity
with the distributed Spark path on every golden query shape.

The fast path runs the SAME per-shard numpy kernel over pyarrow
row-group-pruned reads on the driver — the ES query-node analog — so
(doc_id, score) lists must match the Spark path exactly.
"""

from __future__ import annotations

import pytest

from librecatastro_spark.index.builder import build_index
from librecatastro_spark.engine.wand import CompressedIndex

GOLDEN = [
    dict(text="spark join merge", k=10),
    dict(text="query", k=10, must_not_text="window"),
    dict(text="batch stream line", k=10, require_all=True),
    dict(text="query scan", k=10, filters={"lang": "en"}),
    dict(text="query scan", k=10, prefix=("source", "src1")),
    dict(text="spark join", k=10, should_text="window"),
    dict(text="spark join merge", k=5, offset=5),
    dict(text="table value", k=100),
]


@pytest.fixture(scope="module")
def index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fastpath") / "idx")
    build_index(
        spark, documents, out, id_col="doc_id", text_col="text",
        attr_cols=("lang", "source"), n_shards=4, shards_per_job=4,
        salt_threshold=500, n_salts=4, resume=False,
    )
    return CompressedIndex(spark, out)


def _spark_rows(index, q):
    q = dict(q)
    k = q.pop("k")
    text = q.pop("text")
    return [
        (r["doc_id"], r["score"])
        for r in index.search(text, k=k, **q).collect()
    ]


def _local_rows(index, q):
    q = dict(q)
    k = q.pop("k")
    text = q.pop("text")
    pdf = index.search_local(text, k=k, **q)
    return list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))


@pytest.mark.parametrize("qi", range(len(GOLDEN)))
def test_fastpath_rank_identical(index, qi):
    q = GOLDEN[qi]
    assert _local_rows(index, q) == _spark_rows(index, q)


def test_fuzzy_local_rank_identical(index):
    """Coordinator fuzzy twin (r4): resident-dictionary expansion +
    term-dictionary-seek postings read must equal the distributed
    vocab-scan path exactly — including the max_expansions best-by-df
    cap order, and under prefix_len pinning."""
    for kw in (
        dict(max_edits=1),
        dict(max_edits=2),
        dict(max_edits=1, prefix_len=1),
        dict(max_edits=2, max_expansions=3),
    ):
        d = [(r["doc_id"], r["score"]) for r in
             index.fuzzy_term_search("quer", k=10_000, **kw).collect()]
        lo = index.fuzzy_term_search_local("quer", k=10_000, **kw)
        assert list(zip(lo["doc_id"].tolist(), lo["score"].tolist())) == d
        assert d
    with pytest.raises(ValueError):
        index.fuzzy_term_search_local("quer", max_expansions=0)
    with pytest.raises(ValueError):
        index.fuzzy_term_search_local("two words")


def test_wildcard_regexp_local_rank_identical(index):
    """Coordinator twins for the other two expansion queries (r4):
    resident-dictionary walk + term seek equals the distributed
    vocab-scan paths exactly, incl. the max_expansions cap, a leading
    wildcard, and the '*' full-vocab shape."""
    for pat, kw in (("quer?", {}), ("*ery", {}), ("qu*", {}),
                    ("*", dict(max_expansions=5))):
        d = [(r["doc_id"], r["score"]) for r in
             index.wildcard_term_search(pat, k=10_000, **kw).collect()]
        lo = index.wildcard_term_search_local(pat, k=10_000, **kw)
        assert list(zip(lo["doc_id"].tolist(), lo["score"].tolist())) == d
    for rx, kw in (("quer(y|ies)", {}), ("[a-z]+", dict(max_expansions=4))):
        d = [(r["doc_id"], r["score"]) for r in
             index.regexp_term_search(rx, k=10_000, **kw).collect()]
        lo = index.regexp_term_search_local(rx, k=10_000, **kw)
        assert list(zip(lo["doc_id"].tolist(), lo["score"].tolist())) == d
    with pytest.raises(ValueError):
        index.wildcard_term_search_local("")
    with pytest.raises(ValueError):
        index.regexp_term_search_local("x", max_expansions=0)


def test_composite_local_identical(index):
    """Coordinator composite twin (r4): same buckets/counts/page order
    as the distributed keyset-paged aggregation, on first and deep
    pages."""
    for after in (None, "src1"):
        d = [(r["facet_key"], r["cnt"]) for r in
             index.composite_agg("query scan", "source", size=4,
                                 after=after).collect()]
        lo = index.composite_agg_local("query scan", "source", size=4,
                                       after=after)
        assert list(zip(lo["facet_key"].tolist(),
                        lo["cnt"].tolist())) == d
        assert d or after is not None
    with pytest.raises(ValueError):
        index.composite_agg_local("query", "nosuchcol")


def test_fastpath_nonempty(index):
    assert len(_local_rows(index, GOLDEN[0])) == 10


def test_fastpath_threading_invariant(index, monkeypatch):
    """Shard scoring runs on a thread pool (r3); the pool size must never
    change results — 1 worker ≡ 8 workers on every golden shape."""
    results = {}
    for n in ("1", "8"):
        monkeypatch.setenv("LC_FASTPATH_THREADS", n)
        results[n] = [_local_rows(index, q) for q in GOLDEN]
    assert results["1"] == results["8"]


def test_fastpath_cache_invariant(index, monkeypatch):
    """The decoded-postings cache must never change results: cache
    disabled (LC_POSTING_CACHE_MB=0 — per-shard inline-decode path),
    tiny (every fill exceeds the budget, so entries are served uncached
    and evicted across queries), and default all agree on every golden
    shape. The AND/filtered golden queries additionally exercise the
    small-slice inline path (requests covering <half a term's postings
    bypass the cache)."""
    results = {}
    for mb in ("0", "1", "512"):
        monkeypatch.setenv("LC_POSTING_CACHE_MB", mb)
        index.refresh()  # drop any previously filled cache
        results[mb] = [_local_rows(index, q) for q in GOLDEN]
    assert results["0"] == results["512"]
    assert results["1"] == results["512"]


@pytest.mark.parametrize("path", ["search", "search_local"])
def test_edge_cases_contract(index, path):
    """Degenerate inputs behave identically on both serving paths:
    zero-analyzed-term queries raise (a silent empty would hide caller
    bugs), unknown terms / k=0 / unsatisfiable filters return empty,
    k > corpus returns every match."""
    fn = getattr(index, path)

    def rows(res):
        return res.collect() if hasattr(res, "collect") else list(res.itertuples())

    with pytest.raises(ValueError, match="zero terms"):
        fn("", k=5)
    with pytest.raises(ValueError, match="zero terms"):
        fn("", k=5, must_not_text="query")
    assert rows(fn("zzzqqq nosuchtoken", k=5)) == []
    assert rows(fn("query", k=0)) == []
    assert rows(fn("query", k=5, filters={"lang": "zz"})) == []
    assert rows(fn("query", k=5, prefix=("source", "zzz"))) == []
    big = rows(fn("query", k=10**6))
    assert 0 < len(big) < 10**6


def test_composite_local_null_facet(spark, tmp_path_factory):
    """Nullable facet column (r5 regression): the distributed kernel's
    pandas astype(str) counts nulls as a 'None' bucket; the coordinator
    twin must mirror that conversion exactly — the earlier pyarrow
    string cast KEPT nulls, which value_counts then silently dropped,
    breaking the twins' bucket identity on any nullable facet."""
    docs = spark.createDataFrame(
        [(0, "query scan alpha", None), (1, "query scan beta", "s1"),
         (2, "query scan gamma", None), (3, "query scan delta", "s2"),
         (4, "other words here", None)],
        "doc_id long, text string, src string",
    )
    out = str(tmp_path_factory.mktemp("nullfacet") / "idx")
    build_index(
        spark, docs, out, id_col="doc_id", text_col="text",
        attr_cols=("src",), n_shards=2, shards_per_job=2,
        salt_threshold=500, n_salts=2, resume=False,
    )
    idx = CompressedIndex(spark, out)
    for after in (None, "None"):
        d = [(r["facet_key"], r["cnt"]) for r in
             idx.composite_agg("query scan", "src", size=10,
                               after=after).collect()]
        lo = idx.composite_agg_local("query scan", "src", size=10,
                                     after=after)
        assert list(zip(lo["facet_key"].tolist(),
                        lo["cnt"].tolist())) == d
    full = [(r["facet_key"], r["cnt"]) for r in
            idx.composite_agg("query scan", "src", size=10).collect()]
    assert ("None", 2) in full  # doc 4 doesn't match the query
