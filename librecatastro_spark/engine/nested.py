"""ES ``nested`` query WITH scoring (``score_mode``) — r5.

ES maps every nested object to its OWN Lucene document: BM25 statistics
(N, avgdl, df, dl) are those of the INNER-document space, and a
``nested`` query with ``score_mode`` avg/sum/max ranks parents by the
combination of their MATCHING inner documents' scores (non-matching
inner docs contribute nothing). The reference only ever uses the
filter-shaped nested semantics (reference:
src/utils/elasticsearch_utils.py:38-56 — exists-style predicates over
``constructions``); this module adds the scored form an ES user would
keep after switching engines.

Scale shape: inner scoring is the exact engine's match_scores (postings
⋈ broadcast(df) — one doc-keyed shuffle); the parent combine is ONE
map-side-combinable groupBy (avg = partial sum+count, sum/max trivially
combinable), and the page cut is orderBy().limit() =
TakeOrderedAndProject. Nothing is O(parents) on the driver. A corpus
whose inner table outgrows the exact engine gets its own
CompressedIndex over the inner docs; the combine step is unchanged.

Rounding protocol (frozen, engine/score_queries.py): the combine runs
on RAW inner BM25 sums with ONE final round — rounding inner scores
first and then averaging would land on the half-up vs half-even
boundary between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..bm25 import ROUND_DECIMALS
from .exact import ExactBM25

_SCORE_MODES = {"avg": F.avg, "sum": F.sum, "max": F.max}


def nested_scored_match(
    inner: DataFrame,
    text: str,
    parent_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    score_mode: str = "avg",
) -> DataFrame:
    """Top-k parents of an inner-document table under the ES ``nested``
    query with scoring: inner docs are scored as independent BM25
    documents (the ES nested→Lucene mapping), matching inner scores
    combine per parent via ``score_mode`` ∈ {avg, sum, max}, parents
    rank (score DESC, parent ASC) — the engine's standard tiebreak.

    Returns (parent, score); parents with no matching inner doc are
    absent (ES omits them too)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {sorted(_SCORE_MODES)}, "
            f"got {score_mode!r}"
        )
    eng = ExactBM25(inner, id_col=id_col, text_col=text_col)
    raw = eng.match_scores(text)  # (doc_id, score) — raw, unrounded
    j = raw.join(
        inner.select(
            F.col(id_col).alias("doc_id"), F.col(parent_col).alias("parent")
        ),
        "doc_id",
    )
    comb = _SCORE_MODES[score_mode]
    return (
        j.groupBy("parent")
        .agg(F.round(comb("score"), ROUND_DECIMALS).alias("score"))
        .orderBy(F.desc("score"), F.asc("parent"))
        .limit(k)
    )
