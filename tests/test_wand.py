"""Rank-identity gate: the block-max WAND path must reproduce the exact
scorer's (doc_id, score) on every query (SURVEY.md §7.4 north_rule)."""

from __future__ import annotations

import pytest

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.engine import ExactBM25
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 400, min_tokens=20, max_tokens=150, partitions=4)
    return assign_doc_ids(docs).cache()


@pytest.fixture(scope="module")
def exact(corpus):
    return ExactBM25(corpus, attr_cols=("repo", "path", "lang"), cache=True)


@pytest.fixture(scope="module")
def wand(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("widx"))
    # small blocks + low salt threshold so pruning and salting really engage
    build_index(
        spark, corpus, out, attr_cols=("repo", "path", "lang"),
        n_shards=4, block_size=16, salt_threshold=120, n_salts=4,
    )
    return CompressedIndex(spark, out)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


GOLDEN_QUERIES = [
    dict(text="def return import"),          # hot stop-terms (salted, pruned)
    dict(text="spark session builder"),
    dict(text="id0001"),                      # rare selective term
    dict(text="id0001 def"),                  # rare + hot mix
    dict(text="partition shuffle broadcast", k=25),
    dict(text="match struct impl", require_all=True),
    dict(text="def class", must_not_text="lambda"),
    dict(text="def", filters={"lang": "py"}),
    dict(text="return", prefix=("path", "src/mod1")),
    dict(text="posting block merge", k=3),
    # B7 should clause: optional terms boost but never constrain
    dict(text="def class", should_text="lambda yield"),
    dict(text="id0001", should_text="def return"),
    dict(text="spark session", require_all=True, should_text="builder"),
    # B10 pagination offset
    dict(text="def return import", offset=10),
    dict(text="partition shuffle", k=5, offset=7),
    dict(text="def", filters={"lang": "py"}, offset=5),
]


@pytest.mark.parametrize("q", GOLDEN_QUERIES, ids=lambda q: q["text"])
def test_wand_rank_identical_to_exact(exact, wand, q):
    q = dict(q)
    k = q.pop("k", 10)
    text = q.pop("text")
    assert rows(wand.search(text, k=k, **q)) == rows(exact.search(text, k=k, **q))


def test_wand_zero_hit_query(wand):
    assert rows(wand.search("zzznotindexed")) == []


def test_wand_more_k_than_docs(exact, wand):
    assert rows(wand.search("id0002", k=1000)) == rows(exact.search("id0002", k=1000))
