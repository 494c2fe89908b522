"""Composed training-data curation pipeline — the ops working TOGETHER.

Every stage below is individually oracle-gated (lang_id, quality_score,
dedup_exact, dedup_minhash_lsh, token_count); this module chains them the
way a pretraining-data job actually would — language filter → quality
filter → exact dedup → near-dup removal → per-doc stats — as ONE
declarative DataFrame plan, so Catalyst sees the whole pipeline at once
(filters fold into the scan; each doc is tokenized once per stage-group,
not once per metric; the only shuffles are the two dedup groupings and
the LSH band equi-join — no cartesian anywhere, same audit properties as
the standalone ops in PLANS.md).

Reference analog: the crawl pipeline's per-entry chain of parse →
normalize → dedup-check → store (reference:
src/librecatastro/scrapping/parsers/parser_xml.py:60-115 feeding
cadaster_entry.py:53-77); the LLM-pipeline stages are the engine's
from-scratch extension per the build brief.

Determinism/gating: the near-dup stage uses the SAME minhash-LSH
parameters as the gated ``dedup_minhash_lsh`` (16 single-hash bands,
j ≥ 0.5), whose candidate recall at that threshold is
1 − (1−j)^16 ≥ 0.99998 per qualifying pair and which hash-matches the
exact-Jaccard oracle on every shipped corpus (FIXTURES.md cross-scale
run); the SQL twin therefore drops exact-Jaccard pairs, mirroring the
gated query's oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analyzer import duckdb_tokens_sql, tokenize_expr
from ..bm25 import ROUND_DECIMALS
from .dedup import minhash_lsh_pairs, shingles_sql
from .text import (
    fingerprint_from_toks,
    fingerprint_sql,
    lang_id_from_toks,
    lang_id_sql,
    quality_score_from_toks,
    quality_score_sql,
    token_count_from_toks,
)


def _score_docs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, text, lang_pred, quality, n_tokens, fingerprint) with the
    token array materialized ONCE per row behind an explode(array(...))
    barrier — sibling projection columns otherwise each re-inline the
    tokenize pipeline (Catalyst re-evaluates shared subexpressions per
    column; the same pitfall the r3 minhash fold fixed), which is ~4
    redundant tokenizations per doc on the curation hot path."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.explode(F.array(tokenize_expr(text_col))).alias("toks"),
    )
    return base.select(
        "doc_id",
        "text",
        lang_id_from_toks(F.col("toks")).alias("lang_pred"),
        quality_score_from_toks(F.col("toks"), "text").alias("quality"),
        token_count_from_toks(F.col("toks")).alias("n_tokens"),
        fingerprint_from_toks(F.col("toks")).alias("fingerprint"),
    )


def training_data_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, lang_pred, quality, n_tokens) for every document that
    survives the full curation chain: English, quality ≥ min_quality,
    canonical (lowest doc_id) among its exact-duplicate group, and not a
    near-duplicate (exact Jaccard ≥ threshold, LSH-bucketed candidates)
    of any surviving lower doc_id."""
    scored = _score_docs(docs, id_col, text_col)
    kept = scored.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= min_quality)
    )
    # exact dedup: canonical representative = min doc_id per fingerprint
    # (one hash-partitioned window; the reference's upsert-by-id analog)
    w = Window.partitionBy("fingerprint")
    uniq = kept.withColumn("keep_id", F.min("doc_id").over(w)).where(
        F.col("doc_id") == F.col("keep_id")
    )
    # near-dup removal among the survivors: banded-LSH candidates +
    # exact-Jaccard verify (the gated scale path), drop the HIGHER id of
    # every qualifying pair. `drop` is pair-count-sized → broadcast anti-join.
    pairs = minhash_lsh_pairs(
        uniq.select("doc_id", "text"),
        threshold=jaccard_threshold, n_hashes=16, bands=16,
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        uniq.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang_pred", "quality", "n_tokens")
    )


def training_data_pipeline_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
) -> str:
    """DuckDB twin over the ``documents`` view — same stages, exact
    Jaccard for the near-dup drop (see module docstring for why that is
    the right twin for the LSH path)."""
    return f"""
WITH scored AS (
  SELECT {id_col} AS doc_id, {text_col} AS text,
         {lang_id_sql(text_col)} AS lang_pred,
         {quality_score_sql(text_col)} AS quality,
         len({duckdb_tokens_sql(text_col)}) AS n_tokens,
         {fingerprint_sql(text_col)} AS fingerprint
  FROM documents
),
kept AS (
  SELECT * FROM scored WHERE lang_pred = 'en' AND quality >= {min_quality}
),
uniq AS (
  SELECT * FROM kept
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fingerprint)
),
sh AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql('text', shingle_n)}) AS sh
  FROM uniq
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), {ROUND_DECIMALS})
        >= {jaccard_threshold}
)
SELECT doc_id, lang_pred, quality, n_tokens
FROM uniq
WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
"""
