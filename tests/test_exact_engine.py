"""Exact BM25 engine vs an independent pure-Python scorer.

Mirrors the reference's test strategy (SURVEY.md §5): fixed synthetic docs
with known values, positive AND negative retrieval assertions
(reference: src/tests/utils/elasticsearch_tests.py:43-49), idempotent
index→query→found roundtrip.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from librecatastro_spark.analyzer import analyze_text
from librecatastro_spark.bm25 import B, K1, ROUND_DECIMALS
from librecatastro_spark.engine import ExactBM25

DOCS = [
    (0, "spark join merge spark spark", "py", "org0"),
    (1, "join merge sort shuffle partition", "py", "org1"),
    (2, "spark session builder data frame", "java", "org0"),
    (3, "token term posting block merge", "go", "org1"),
    (4, "spark spark spark spark spark join", "py", "org0"),
    (5, "completely unrelated words here nothing", "rs", "org2"),
]


def py_bm25(query: str, require_all=False, exclude=None):
    """Independent slow scorer (pure python) — the golden generator."""
    toks = {d[0]: analyze_text(d[1]) for d in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = sorted(set(analyze_text(query)))
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    out = {}
    for doc_id, tk in toks.items():
        tf = Counter(tk)
        matched = [t for t in terms if tf[t] > 0]
        if not matched or (require_all and len(matched) < len(terms)):
            continue
        if exclude and any(e in tk for e in analyze_text(exclude)):
            continue
        s = 0.0
        for t in matched:
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            dl = len(tk)
            s += idf * tf[t] * (K1 + 1) / (tf[t] + K1 * (1 - B + B * dl / avgdl))
        out[doc_id] = round(s, ROUND_DECIMALS)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string, lang string, repo string")
    return ExactBM25(df, id_col="doc_id", text_col="content", attr_cols=("lang", "repo"))


def _got(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_match_topk_rank_identical(engine):
    assert _got(engine.search("spark join", k=10)) == py_bm25("spark join")


def test_match_single_term(engine):
    assert _got(engine.search("merge", k=10)) == py_bm25("merge")


def test_negative_query(engine):
    # negative retrieval assertion (elasticsearch_tests.py:47-49 analog)
    assert engine.hits_total("zzzznotpresent") == 0


def test_bool_must_requires_all_terms(engine):
    got = _got(engine.search("spark shuffle", k=10, require_all=True))
    assert got == py_bm25("spark shuffle", require_all=True) == []
    got2 = _got(engine.search("spark merge", k=10, require_all=True))
    assert got2 == py_bm25("spark merge", require_all=True)
    assert {d for d, _ in got2} == {0}


def test_must_not(engine):
    got = _got(engine.search("spark", k=10, must_not_text="session"))
    assert got == py_bm25("spark", exclude="session")
    assert all(d != 2 for d, _ in got)


def test_keyword_filter_constant_score(engine):
    got = _got(engine.search("spark join", k=10, filters={"lang": "py"}))
    expected = [(d, s) for d, s in py_bm25("spark join") if d in (0, 1, 4)]
    assert got == expected


def test_prefix_filter(engine):
    got = _got(engine.search("merge", k=10, prefix=("repo", "org1")))
    assert {d for d, _ in got} == {1, 3}


def test_topk_limit_and_tiebreak(engine):
    got = _got(engine.search("merge", k=2))
    assert got == py_bm25("merge")[:2]


def test_exists_flagship_dedup_shape(engine):
    # B8: prefix + keyword eq, size 11, hits.total > 0
    assert engine.exists(filters={"lang": "py"}, prefix=("repo", "org0")) is True
    assert engine.exists(filters={"lang": "rs"}, prefix=("repo", "org0")) is False


def test_hits_total(engine):
    assert engine.hits_total("spark") == 3
    assert engine.hits_total("merge") == 3
    assert engine.hits_total("spark merge") == 5
