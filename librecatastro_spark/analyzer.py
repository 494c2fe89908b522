"""Text analysis chain (reference capability B3).

The reference maps every string field to an analyzed ``text`` field via a
dynamic template (reference: src/utils/elasticsearch_utils.py:58-72), i.e.
the ES *standard analyzer*: Unicode word segmentation + lowercase, postings
with term frequencies. This module freezes our analyzer spec once — every
consumer (index build, query analysis, the DuckDB oracle, golden fixtures)
uses exactly this definition, so results are rank-identical across paths.

Spec (applies to code-like ASCII corpora per BASELINE.json input_hint):
    lowercase → split on ``[^a-z0-9_]+`` → drop empty tokens

Three equivalent implementations, equality-tested in tests/test_analyzer.py:
  * ``tokenize_expr``  — pure Catalyst (JVM, whole-stage codegen): the
    default hot path. Tokenization stays out of Python entirely.
  * ``tokenize_udf``   — Arrow-vectorized pandas_udf: the seam where a
    production code-aware analyzer (camelCase split, stemming) would plug
    in without touching the engine.
  * ``analyze_text``   — driver-side Python for query strings (tiny input).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType, StringType

# The single source of truth for token boundaries.
TOKEN_SPLIT_RE = "[^a-z0-9_]+"
_PY_SPLIT = re.compile(TOKEN_SPLIT_RE)
# complement form: a token IS a run of these chars (findall(TOKEN_RE) ==
# split(TOKEN_SPLIT_RE) minus empties — equality-tested in test_analyzer)
TOKEN_RE = "[a-z0-9_]+"
_PY_FINDALL = re.compile(TOKEN_RE)


def tokenize_expr(col: Column | str) -> Column:
    """Catalyst tokenizer: array<string> of analyzed terms (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


class Analyzer:
    """A parameterized tokenization spec — the per-field analyzer hook ES
    mappings give (``analyzer: …`` per field). Shape is FROZEN to the
    engine's one chain (lowercase → regex split → drop empties) so every
    path can evaluate it identically (Python re, Catalyst split, Arrow
    split_pattern_regex all take the same RE2-compatible pattern); only
    the boundary pattern varies. ``Analyzer()`` IS the default code
    analyzer — ``analyze("x") == analyze_text("x")`` by construction.

    An index records its pattern in meta.json (``analyzer_re``), and the
    query side analyzes with the INDEX's analyzer (ES match semantics) —
    so a per-field custom analyzer can never silently mismatch its own
    postings. Custom split patterns are out of oracle scope (the DuckDB
    twins pin the default chain); MultiFieldIndex threads one per field.

    ``stopwords`` is the ES stop token filter: matching tokens are
    dropped AFTER segmentation (recorded in meta like ``analyzer_re``
    and honored by build, append and query analysis; positions index the
    FILTERED sequence, so phrase adjacency means "adjacent after
    stopword removal" — the frozen, oracle-expressible contract: the
    DuckDB twin is a NOT IN filter in the token CTE).

    ``synonyms`` is the ES synonym token filter in its replace form
    (``src => dst``, one token to one token): each source token maps to
    its canonical target. Frozen chain order: lowercase → split → drop
    empties → **synonyms** → **stopwords** (so a synonym mapping ONTO a
    stopword is removed, and the stop list is checked against canonical
    forms). The 1:1 mapping preserves token count and position, so dl,
    positions and phrase adjacency are unaffected by which surface form
    a document used — the DuckDB twin is a CASE WHEN in the token CTE."""

    def __init__(
        self,
        split_re: str | None = None,
        stopwords: frozenset[str] | None = None,
        synonyms: dict[str, str] | None = None,
    ):
        self.split_re = split_re or TOKEN_SPLIT_RE
        self._rx = re.compile(self.split_re)
        self.stopwords = frozenset(stopwords) if stopwords else frozenset()
        self.synonyms = dict(synonyms) if synonyms else {}

    def analyze(self, text: str) -> list[str]:
        if text is None:
            return []
        syn = self.synonyms
        out = []
        for t in self._rx.split(text.lower()):
            if not t:
                continue
            t = syn.get(t, t)
            if t not in self.stopwords:
                out.append(t)
        return out

    def tokenize_expr(self, col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        toks = F.filter(
            F.split(F.lower(c), self.split_re), lambda x: x != F.lit("")
        )
        if self.synonyms:
            # element_at on a map literal is NULL for non-keys; coalesce
            # keeps unmapped tokens as themselves
            m = F.create_map(
                *[F.lit(x) for k in sorted(self.synonyms)
                  for x in (k, self.synonyms[k])]
            )
            toks = F.transform(
                toks, lambda x: F.coalesce(F.element_at(m, x), x)
            )
        if self.stopwords:
            sw = F.array(*[F.lit(s) for s in sorted(self.stopwords)])
            toks = F.filter(toks, lambda x: ~F.array_contains(sw, x))
        return toks


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer — semantically identical to tokenize_expr.

    Pandas `.str` ops run in C over the whole Arrow batch; no per-row
    Python beyond the final list comprehension on already-split arrays.
    """
    lowered = s.fillna("").str.lower()
    split = lowered.str.split(_PY_SPLIT)
    return split.map(lambda toks: [t for t in toks if t])


@F.pandas_udf(LongType())
def token_count_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized token count (= dl). CPython's C regex engine runs
    ~30× faster than the JVM's on this char-class pattern (measured), so
    doc-length extraction over big corpora goes through Arrow batches here
    rather than Catalyst split()."""
    lowered = s.fillna("").str.lower()
    return pd.Series(
        [len(_PY_FINDALL.findall(x)) for x in lowered], dtype="int64"
    )


def analyze_text(text: str) -> list[str]:
    """Driver-side analysis for query strings (reference analyzes the query
    text with the same analyzer as the field — ES `match` semantics,
    reference: src/librecatastro/domain/cadaster_entry/cadaster_entry.py:66).
    """
    if text is None:
        return []
    return [t for t in _PY_SPLIT.split(text.lower()) if t]


def duckdb_tokens_sql(col: str) -> str:
    """DuckDB SQL fragment producing the same array<string> — used by the
    oracle_sql() twins in __spark_entry__.py."""
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_RE}'),"
        " x -> x <> '')"
    )


def phrase_expr(col: Column | str, terms_seq: list[str]) -> Column:
    """TRUE iff the analyzed token sequence of ``col`` contains
    ``terms_seq`` contiguously (ES match_phrase position semantics,
    slop 0). Tokens can never contain a space (TOKEN_RE is ``[a-z0-9_]+``),
    so sentinel-padded space-joined containment is EXACT — no positional
    postings needed to evaluate the predicate on a candidate document.
    Pure Catalyst (split/filter/array_join/contains), whole-stage codegen."""
    joined = F.concat(
        F.lit(" "), F.array_join(tokenize_expr(col), " "), F.lit(" ")
    )
    return joined.contains(" " + " ".join(terms_seq) + " ")


def analyzer_classes(split_re: str | None = None) -> tuple[str, str]:
    """Derive the (gap, token) character-class patterns from an analyzer
    split pattern of the frozen shape ``[^X]+`` (a negated class, one or
    more) — the only shape ``Analyzer`` produces: gap = the split
    pattern itself (a maximal non-token run), token = ``[X]+`` (a
    maximal token run). Every phrase predicate derives its boundary
    classes from the INDEX's own analyzer through this helper, so
    verify-first phrase verification agrees with the index's
    tokenization (the positional paths agree by construction — they
    never re-tokenize the source).

    Raises ValueError for a pattern outside the derivable shape: a
    free-form analyzer regex has no complement the phrase regex could
    use, so verify-first phrase queries on such an index must route to
    the positional (index-only) paths instead."""
    if split_re is None:
        split_re = TOKEN_SPLIT_RE
    m = re.fullmatch(r"\[\^([^\[\]]+)\]\+", split_re)
    if m is None:
        raise ValueError(
            f"analyzer pattern {split_re!r} is not a negated character "
            "class ('[^X]+') — verify-first phrase predicates cannot "
            "derive token boundaries from it; use the positional "
            "(index_options='positions') phrase paths instead"
        )
    return split_re, f"[{m.group(1)}]+"


def _term_alternation(term: str, synonyms: dict[str, str] | None) -> str:
    """Regex fragment matching every SURFACE form that analyzes to the
    canonical ``term`` under the (1:1, replace-form) synonym map: the
    preimage {s : syn.get(s, s) == term}, escaped and alternated. With
    no synonyms this is just the escaped term. A canonical term whose
    preimage is empty (it is itself remapped and nothing maps to it)
    can never appear in a document — a never-matching group."""
    if not synonyms:
        return re.escape(term)
    forms = sorted(
        {s for s in synonyms if synonyms[s] == term}
        | ({term} if synonyms.get(term, term) == term else set())
    )
    if not forms:
        return r"(?!)"
    if len(forms) == 1:
        return re.escape(forms[0])
    return "(?:" + "|".join(re.escape(f) for f in forms) + ")"


def _phrase_body(
    terms_seq: list[str], slop: int = 0, split_re: str | None = None,
    synonyms: dict[str, str] | None = None,
) -> str:
    """Shared regex body for the phrase predicates: terms in order, each
    inter-term gap = one non-token run plus up to ``slop`` intervening
    (token + non-token-run) pairs. slop=0 is exact adjacency of maximal
    token runs. PER-GAP slop — a deliberate, documented divergence from
    ES's total-position-edit-distance slop (which also admits
    transpositions at cost 2): per-gap keeps the predicate a single
    regex pass that Spark, CPython sre, and DuckDB RE2 all evaluate
    identically, so the oracle twin is exact by construction.

    ``split_re`` selects the INDEX's analyzer (meta.analyzer_re): the
    gap/token classes derive from it via ``analyzer_classes``, and terms
    are regex-escaped (a custom token class may admit regex metachars
    like ``.``; escaping is a no-op for default-chain terms).
    ``synonyms`` (the index's replace-form map) turns each canonical
    term into the alternation of its surface forms — the 1:1 map
    preserves token positions, so surface adjacency IS canonical
    adjacency and the verify regex stays exact."""
    if not terms_seq:
        raise ValueError("phrase needs at least one term")
    gap, token = analyzer_classes(split_re)
    if slop > 0:
        gap = gap + "(?:%s%s){0,%d}" % (token, gap, slop)
    return gap.join(_term_alternation(t, synonyms) for t in terms_seq)


def phrase_rlike_expr(
    col: Column | str,
    terms_seq: list[str],
    slop: int = 0,
    split_re: str | None = None,
) -> Column:
    """Single-regex-pass equivalent of ``phrase_expr`` (equality-tested in
    tests/test_phrase.py): tokens are MAXIMAL ``[a-z0-9_]+`` runs of the
    lowercased text, so the token sequence contains ``terms_seq``
    contiguously iff ``lower(col)`` matches

        (\\A|[^a-z0-9_]) t1 [^a-z0-9_]+ t2 ... tn ([^a-z0-9_]|\\z)

    — each inter-term gap is >=1 non-token chars (adjacency of maximal
    runs) and the end anchors enforce maximality of t1/tn themselves.
    ``\\A``/``\\z`` rather than ``^``/``$``: Java's ``$`` matches before a
    trailing newline even without MULTILINE, which would NOT change
    membership here (a trailing ``\\n`` is a non-token char so the other
    alternative fires) but ``\\z`` keeps the proof one-line. Terms come
    from the analyzer so they are regex-safe ``[a-z0-9_]+`` literals.

    Why it exists: ``phrase_expr`` builds the full token array per row
    (split -> filter -> array_join) just to run one containment; on a
    candidate-verify over a hot phrase that allocation dominates. One
    codegen'd ``RLIKE`` over ``lower(col)`` does the same membership test
    in a single scan with zero allocation.
    """
    c = F.col(col) if isinstance(col, str) else col
    gap, _ = analyzer_classes(split_re)
    body = _phrase_body(terms_seq, slop, split_re)
    return F.lower(c).rlike(r"(\A|" + gap[:-1] + r")" + body
                            + r"(" + gap[:-1] + r"|\z)")


def phrase_match_udf(
    terms_seq: list[str], slop: int = 0, split_re: str | None = None,
    synonyms: dict[str, str] | None = None,
):
    """Arrow-vectorized twin of ``phrase_rlike_expr`` — the PRODUCTION
    phrase verify. Same regex (Python spells end-of-input ``\\Z`` where
    Java spells ``\\z``), but evaluated by CPython's sre over Arrow
    batches: measured 0.78 s vs 4.7 s for the JVM RLIKE (and 62 s for
    the split/array_join Catalyst form) on a 60 k-doc / 0.37 GB corpus —
    the same ~6-30x JVM-regex gap already measured and documented for
    ``token_count_udf`` above. Equality with the Catalyst forms is
    pinned in tests/test_phrase.py. ``split_re`` = the index's analyzer
    pattern (meta.analyzer_re) — boundary classes derive from it, so the
    verify agrees with the index's own tokenization; ``synonyms`` =
    the index's replace-form map (surface-form alternation)."""
    gap, _ = analyzer_classes(split_re)
    body = _phrase_body(terms_seq, slop, split_re, synonyms)
    bcls = gap[:-1]  # the single-char boundary class (strip the '+')
    pat = re.compile(r"(?:\A|" + bcls + r")" + body + r"(?:" + bcls + r"|\Z)")

    @F.pandas_udf(BooleanType())
    def _matches(s: pd.Series) -> pd.Series:
        return s.fillna("").str.lower().str.contains(pat, regex=True)

    return _matches


def _phrase_prefix_body(
    terms_seq: list[str], prefix: str, split_re: str | None = None
) -> str:
    """Regex body for match_phrase_prefix: the COMPLETE terms adjacent in
    order, then a gap, then a token that STARTS WITH ``prefix`` — no
    right anchor, so any completion of the prefix token matches. With no
    complete terms the body is just the prefix at a token start (the
    caller normally routes that case to the term-prefix query instead).
    Boundary classes derive from ``split_re`` (the index's analyzer)
    like ``_phrase_body``; prefix and terms are regex-escaped."""
    if not prefix:
        raise ValueError("phrase prefix needs a non-empty last term")
    if not terms_seq:
        return re.escape(prefix)
    gap, _ = analyzer_classes(split_re)
    return _phrase_body(terms_seq, 0, split_re) + gap + re.escape(prefix)


def phrase_prefix_rlike_expr(
    col: Column | str,
    terms_seq: list[str],
    prefix: str,
    split_re: str | None = None,
) -> Column:
    """Catalyst form of the phrase-prefix predicate (see
    ``_phrase_prefix_body``): left-anchored at a token start, open on the
    right."""
    c = F.col(col) if isinstance(col, str) else col
    gap, _ = analyzer_classes(split_re)
    body = _phrase_prefix_body(terms_seq, prefix, split_re)
    return F.lower(c).rlike(r"(\A|" + gap[:-1] + r")" + body)


def phrase_prefix_match_udf(
    terms_seq: list[str], prefix: str, split_re: str | None = None
):
    """Arrow-vectorized twin of ``phrase_prefix_rlike_expr`` — same
    CPython-sre production role as ``phrase_match_udf``."""
    gap, _ = analyzer_classes(split_re)
    body = _phrase_prefix_body(terms_seq, prefix, split_re)
    pat = re.compile(r"(?:\A|" + gap[:-1] + r")" + body)

    @F.pandas_udf(BooleanType())
    def _matches(s: pd.Series) -> pd.Series:
        return s.fillna("").str.lower().str.contains(pat, regex=True)

    return _matches


def duckdb_phrase_prefix_sql(col: str, terms_seq: list[str], prefix: str) -> str:
    """DuckDB RE2 twin of ``phrase_prefix_rlike_expr`` (same pattern
    verbatim; RE2 spells \\A like Java and the open right side needs no
    anchor translation)."""
    body = _phrase_prefix_body(terms_seq, prefix)
    pat = r"(\A|[^a-z0-9_])" + body
    return f"regexp_matches(lower({col}), '{pat}')"


def duckdb_phrase_sql(col: str, terms_seq: list[str], slop: int = 0) -> str:
    """DuckDB twin of phrase_expr — same sentinel-padded containment over
    the same analyzed token array (slop=0), or the same anchored regex
    as phrase_rlike_expr via RE2 for sloppy phrases (slop>0; RE2 spells
    the text anchors \\A/\\z like Java, and DuckDB regular strings keep
    backslashes literal, so the pattern ships verbatim)."""
    if slop > 0:
        body = _phrase_body(terms_seq, slop)
        pat = r"(\A|[^a-z0-9_])" + body + r"([^a-z0-9_]|\z)"
        return f"regexp_matches(lower({col}), '{pat}')"
    phrase = " ".join(terms_seq)
    return (
        f"contains(' ' || array_to_string({duckdb_tokens_sql(col)}, ' ')"
        f" || ' ', ' {phrase} ')"
    )
