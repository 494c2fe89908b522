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
parameters as the gated ``dedup_minhash_lsh`` (32 hashes × 16 two-row
bands, j ≥ 0.5), whose candidate recall at that threshold is
1 − (1−j²)^16 ≥ 0.99 per qualifying pair (BENCH.md's S-curve; the
two-row banding is the r3 zipfian-skew fix that collapsed the hot
bucket) and which hash-matches the exact-Jaccard oracle on every
shipped corpus (FIXTURES.md cross-scale run); the SQL twin therefore
drops exact-Jaccard pairs, mirroring the gated query's oracle contract.
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
    n_hashes: int = 32,
    bands: int = 16,
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
    # rows-per-band = n_hashes // bands. Rows-per-band 2 (the default)
    # is the zipfian-skew guard: with 1-hash bands the globally
    # hottest-hashing shingle puts every doc containing it in ONE bucket
    # (measured on the 60k synthetic code corpus: max bucket 18,807 docs
    # → 333M candidate pairs — a quadratic blowup no equi-join plan can
    # save); requiring TWO simultaneous min-hash matches shrinks hot
    # buckets quadratically while keeping the LSH S-curve steep
    # (P(candidate) = 1 − (1 − j²)^16 ≥ 0.99 at j ≥ 0.5, →1 for strong
    # dups). The SQL twin mirrors the banding exactly, so the oracle is
    # corpus-independent; recall vs exact Jaccard is pytest-measured.
    pairs = minhash_lsh_pairs(
        uniq.select("doc_id", "text"),
        threshold=jaccard_threshold, n_hashes=n_hashes, bands=bands,
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        uniq.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang_pred", "quality", "n_tokens")
    )


def _banded_pairs_cte_sql(
    n_hashes: int, bands: int, jaccard_threshold: float,
) -> str:
    """CTE fragment computing near-dup ``pairs(doc_a, doc_b)`` exactly as
    the Spark path does — minhash signatures over the ``shg`` CTE
    (doc_id, sh list), banded candidate equi-join, exact-Jaccard verify
    against the exploded ``sh``/``sizes`` CTEs — so the oracle's
    candidate set is the SAME deterministic function of content as the
    engine's (the embedding_near_dup frozen-twin pattern)."""
    rows = n_hashes // bands
    from .dedup import minhash_cols_sql

    sig_cols = ", ".join(["doc_id"] + minhash_cols_sql(n_hashes))
    band_selects = []
    for bi in range(bands):
        key = " || ',' || ".join(
            f"mh{bi * rows + r}::VARCHAR" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, md5({key}) AS key FROM sig"
        )
    bands_sql = "\n  UNION ALL ".join(band_selects)
    return f"""
sig AS (SELECT {sig_cols} FROM shg),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), {ROUND_DECIMALS})
        >= {jaccard_threshold}
)"""


def training_data_pipeline_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    n_hashes: int = 32,
    bands: int = 16,
) -> str:
    """DuckDB twin over the ``documents`` view — same stages, banded
    candidates + exact-Jaccard verify for the near-dup drop (see
    ``training_data_pipeline`` for why the twin mirrors the banding)."""
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
shg AS (
  SELECT doc_id, {shingles_sql('text', shingle_n)} AS sh FROM uniq
),
sh AS (
  SELECT DISTINCT doc_id, unnest(sh) AS sh FROM shg
),
{_banded_pairs_cte_sql(n_hashes, bands, jaccard_threshold)}
SELECT doc_id, lang_pred, quality, n_tokens
FROM uniq
WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
"""
