"""BM25 scoring math — frozen once for every engine path (SURVEY.md §7.4).

Semantics to reproduce: Lucene/ES 6.x default similarity (public knowledge;
the reference relies on it for every `match` query, e.g. reference:
src/librecatastro/domain/cadaster_entry/cadaster_entry.py:66):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d) = sum over matched query terms of w(t, d)

with k1 = 1.2, b = 0.75. Scores are compared/reported rounded to
ROUND_DECIMALS so that summation-order float noise (Spark vs DuckDB vs
numpy) can never flip a rank; ties break (score DESC, doc_id ASC) —
capability B10's deterministic tiebreak.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
ROUND_DECIMALS = 4


def idf_expr(df_col: Column, n_docs: float) -> Column:
    """Lucene-form idf as a Catalyst expression; n_docs is a driver constant
    (computed in the single doc-stats pass and broadcast as a literal)."""
    return F.log((F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def tf_weight_expr(tf_col: Column, dl_col: Column, avgdl: float) -> Column:
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_col / F.lit(float(avgdl)))
    return tf_col * F.lit(K1 + 1.0) / (tf_col + norm)


def bm25_weight_expr(tf_col: Column, df_col: Column, dl_col: Column, n_docs: float, avgdl: float) -> Column:
    return idf_expr(df_col, n_docs) * tf_weight_expr(tf_col, dl_col, avgdl)


# --- numpy twins (used by the codec/WAND path and by golden generators) ---

def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_weight_np(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_sql(tf: str, df: str, dl: str, n: str, avgdl: str) -> str:
    """DuckDB SQL fragment computing the same weight — for oracle_sql()."""
    return (
        f"ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5))"
        f" * {tf} * ({K1} + 1) / ({tf} + {K1} * (1 - {B} + {B} * {dl} / {avgdl}))"
    )
