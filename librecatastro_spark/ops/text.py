"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword-ratio heuristic), quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (JVM-side, codegen)
with DuckDB SQL twins for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analyzer import duckdb_tokens_sql, tokenize_expr
from ..bm25 import ROUND_DECIMALS

# Frozen English function-word list for the n-gram/stopword heuristic.
STOPWORDS_EN = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "from", "or", "be", "are", "this", "that",
]

LANGID_THRESHOLD = 0.04


def _stop_array() -> Column:
    return F.array(*[F.lit(w) for w in STOPWORDS_EN])


def token_count_from_toks(toks: Column) -> Column:
    return F.size(toks)


def token_count_expr(text_col: str | Column) -> Column:
    return token_count_from_toks(tokenize_expr(text_col))


def stopword_ratio_from_toks(toks: Column) -> Column:
    stops = F.size(F.filter(toks, lambda x: F.array_contains(_stop_array(), x)))
    return F.when(F.size(toks) > 0, stops / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio_expr(text_col: str | Column) -> Column:
    return stopword_ratio_from_toks(tokenize_expr(text_col))


def lang_id_from_toks(toks: Column) -> Column:
    """'en' if the stopword ratio clears the threshold, else 'unk'."""
    return F.when(
        stopword_ratio_from_toks(toks) >= F.lit(LANGID_THRESHOLD), F.lit("en")
    ).otherwise(F.lit("unk"))


def lang_id_expr(text_col: str | Column) -> Column:
    return lang_id_from_toks(tokenize_expr(text_col))


def uniq_ratio_from_toks(toks: Column) -> Column:
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))


def uniq_ratio_expr(text_col: str | Column) -> Column:
    return uniq_ratio_from_toks(tokenize_expr(text_col))


def punct_ratio_expr(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    nonword = F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9_ ]", ""))
    return F.when(F.length(c) > 0, nonword / F.length(c)).otherwise(F.lit(0.0))


def quality_score_from_toks(toks: Column, text_col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + lexical
    diversity + low punctuation noise (the usual pretraining filters).
    ``toks`` variant so a multi-metric projection can materialize the
    token array ONCE (Catalyst re-evaluates shared subexpressions per
    sibling column — see ops/pipeline.py's barrier)."""
    n = token_count_from_toks(toks)
    len_ok = F.when((n >= 20) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    score = (
        F.lit(0.4) * len_ok
        + F.lit(0.4) * uniq_ratio_from_toks(toks)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio_expr(text_col) * 4))
    )
    return F.round(score, ROUND_DECIMALS)


def quality_score_expr(text_col: str | Column) -> Column:
    return quality_score_from_toks(tokenize_expr(text_col), text_col)


def fingerprint_from_toks(toks: Column) -> Column:
    """Normalized-content fingerprint: md5 of the analyzed token stream —
    whitespace/punctuation-insensitive exact-dup key."""
    return F.md5(F.concat_ws(" ", toks))


def fingerprint_expr(text_col: str | Column) -> Column:
    return fingerprint_from_toks(tokenize_expr(text_col))


def unigram_logprob(docs, id_col: str = "doc_id", text_col: str = "content"):
    """(doc_id, lm_score): mean unigram log-likelihood of each document
    under the corpus's OWN unigram model, p(t) = cf(t) / Σcf — the classic
    cheap LM-quality filter (documents of common boilerplate score high,
    documents of one-off identifiers score low; threshold the tails).

    Plan shape at 100 TB: the corpus-frequency table is VOCAB-bounded and
    broadcasts (one scan computes it with map-side partial aggregation);
    the scoring pass explodes tokens, hash-joins the broadcast cf table,
    and mean-aggregates per doc — one shuffle keyed by doc_id, partially
    aggregated map-side. Σcf is one scalar collect. No per-row Python.
    Twinned verbatim in unigram_logprob_sql.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(text_col)).alias("term"),
    )
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cf"))
    total = float(cf.agg(F.sum("cf")).collect()[0][0] or 0.0)
    if total == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, lm_score double"
        )
    return (
        toks.join(F.broadcast(cf), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("cf") / F.lit(total))), ROUND_DECIMALS)
            .alias("lm_score")
        )
    )


def repetition_signals(
    docs, id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """(doc_id, top_bigram_frac, dup_trigram_frac): the Gopher-style
    repetition filters (Rae et al. 2021 §A1.1) — fraction of all bigram
    occurrences taken by the single most frequent bigram, and fraction
    of trigram occurrences that are repeats (1 − distinct/total). High
    values mark boilerplate / degenerate generations; threshold to drop.

    Plan shape at 100 TB: ZERO shuffles. Both signals are per-row
    Catalyst expressions — the top-bigram count folds over the SORTED
    bigram array (max run length of equal neighbours == max multiplicity,
    O(n log n) per row, JVM-side), instead of the explode → groupBy
    (doc, bigram) → groupBy doc two-exchange alternative. The fold's
    lambda only touches its own accumulator/element (no free outer
    array), so the Catalyst per-element re-evaluation trap documented on
    shingles_expr does not apply.
    """
    from .dedup import shingles_expr

    bg = F.array_sort(shingles_expr(text_col, 2))
    tg = shingles_expr(text_col, 3)
    run = F.aggregate(
        bg,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    top_bg = F.when(
        F.size(bg) > 0, run.cast("double") / F.size(bg)
    ).otherwise(F.lit(0.0))
    dup_tg = F.when(
        F.size(tg) > 0,
        F.lit(1.0) - F.size(F.array_distinct(tg)).cast("double") / F.size(tg),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(top_bg, ROUND_DECIMALS).alias("top_bigram_frac"),
        F.round(dup_tg, ROUND_DECIMALS).alias("dup_trigram_frac"),
    )


# ------------------------------------------------------------ SQL twins --

def stopword_ratio_sql(col: str) -> str:
    toks = duckdb_tokens_sql(col)
    stops = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, x -> list_contains([{stops}], x)))::DOUBLE / len({toks}) "
        f"ELSE 0.0 END)"
    )


def lang_id_sql(col: str) -> str:
    return f"(CASE WHEN {stopword_ratio_sql(col)} >= {LANGID_THRESHOLD} THEN 'en' ELSE 'unk' END)"


def quality_score_sql(col: str) -> str:
    toks = duckdb_tokens_sql(col)
    n = f"len({toks})"
    len_ok = f"(CASE WHEN {n} >= 20 AND {n} <= 5000 THEN 1.0 WHEN {n} > 0 THEN 0.5 ELSE 0.0 END)"
    uniq = f"(CASE WHEN {n} > 0 THEN len(list_distinct({toks}))::DOUBLE / {n} ELSE 0.0 END)"
    punct = (
        f"(CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length(regexp_replace({col}, '[^a-zA-Z0-9_ ]', '', 'g')))::DOUBLE / length({col}) "
        f"ELSE 0.0 END)"
    )
    return (
        f"round(0.4 * {len_ok} + 0.4 * {uniq} + 0.2 * (1.0 - least(1.0, {punct} * 4)), "
        f"{ROUND_DECIMALS})"
    )


def fingerprint_sql(col: str) -> str:
    return f"md5(array_to_string({duckdb_tokens_sql(col)}, ' '))"


def repetition_signals_sql(col: str = "text") -> str:
    """Full SELECT — DuckDB twin of repetition_signals over ``documents``.
    The oracle computes top-bigram multiplicity the set-based way
    (unnest → count per (doc, bigram) → max), deliberately a DIFFERENT
    algorithm from the Spark sorted-run fold, so agreement checks the
    semantics rather than mirroring the implementation."""
    from .dedup import shingles_sql

    bg = shingles_sql(col, 2)
    tg = shingles_sql(col, 3)
    return f"""
WITH base AS (SELECT doc_id, {bg} AS bg, {tg} AS tg FROM documents),
cnt AS (
  SELECT doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS b FROM base) e
  GROUP BY doc_id, b
),
top AS (SELECT doc_id, max(c) AS mx FROM cnt GROUP BY doc_id)
SELECT b.doc_id,
       round(CASE WHEN len(b.bg) > 0 THEN t.mx::DOUBLE / len(b.bg) ELSE 0.0 END,
             {ROUND_DECIMALS}) AS top_bigram_frac,
       round(CASE WHEN len(b.tg) > 0
                  THEN 1.0 - len(list_distinct(b.tg))::DOUBLE / len(b.tg)
                  ELSE 0.0 END, {ROUND_DECIMALS}) AS dup_trigram_frac
FROM base b LEFT JOIN top t USING (doc_id)"""


def unigram_logprob_sql(col: str = "text") -> str:
    """Full SELECT — DuckDB twin of unigram_logprob over ``documents``."""
    toks = duckdb_tokens_sql(col)
    return f"""
WITH lt AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
lcf AS (SELECT term, count(*)::DOUBLE AS cf FROM lt GROUP BY 1),
ltot AS (SELECT sum(cf) AS s FROM lcf)
SELECT doc_id, round(avg(ln(cf / s)), {ROUND_DECIMALS}) AS lm_score
FROM lt JOIN lcf USING (term) CROSS JOIN ltot
GROUP BY doc_id"""
