"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB twins; the analyzer + BM25 math are frozen in
librecatastro_spark.{analyzer,bm25} and the SQL is generated from the same
constants, so Spark and DuckDB compute identical (rounded) values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from librecatastro_spark.analyzer import analyze_text, duckdb_tokens_sql, tokenize_expr
from librecatastro_spark.bm25 import ROUND_DECIMALS, bm25_sql
from librecatastro_spark.engine import ExactBM25
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str) -> CompressedIndex:
    """Build (once, resumable no-op afterwards) and open the compressed
    index for sf_dir. Keyed by source mtime so stale indexes rebuild."""
    import hashlib

    src = f"{sf_dir}/documents.parquet"
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    key = hashlib.sha256(f"{sf_dir}:{mtime}".encode()).hexdigest()[:16]
    out = os.path.join("/tmp", f"lc_index_{key}")
    build_index(
        spark, _docs(spark, sf_dir), out, id_col="doc_id", text_col="text",
        attr_cols=("lang", "source"), n_shards=8, block_size=128,
        salt_threshold=5_000, n_salts=8, resume=True,
    )
    return CompressedIndex(spark, out)


def _engine(spark: SparkSession, sf_dir: str) -> ExactBM25:
    return ExactBM25(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        attr_cols=("lang", "source"),
    )


# --------------------------------------------------------------------- #
# DuckDB oracle-SQL generator (same analyzer spec + BM25 constants)
# --------------------------------------------------------------------- #

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, unnest({duckdb_tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
g  AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl)
"""


def _sql_terms(text: str) -> str:
    terms = sorted(set(analyze_text(text)))
    return ", ".join(f"'{t}'" for t in terms)


def _bm25_oracle(
    text: str,
    k: int = 10,
    require_all: bool = False,
    filters: dict[str, str] | None = None,
    prefix: tuple[str, str] | None = None,
    must_not_text: str | None = None,
) -> str:
    terms = sorted(set(analyze_text(text)))
    in_list = _sql_terms(text)
    w = bm25_sql("tf.tf", "dfq.df", "dl.dl", "g.n", "g.avgdl")
    conds = []
    if require_all:
        conds.append(f"n_matched = {len(terms)}")
    doc_conds = []
    for col, val in (filters or {}).items():
        doc_conds.append(f"{col} = '{val}'")
    if prefix is not None:
        doc_conds.append(f"{prefix[0]} LIKE '{prefix[1]}%'")
    if doc_conds:
        conds.append(
            "doc_id IN (SELECT doc_id FROM documents WHERE " + " AND ".join(doc_conds) + ")"
        )
    if must_not_text:
        conds.append(
            "doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term IN ("
            + _sql_terms(must_not_text) + "))"
        )
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
WITH {_TOKS_CTE},
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf WHERE term IN ({in_list}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum({w}) AS raw, count(*) AS n_matched
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  WHERE tf.term IN ({in_list})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score FROM scored
{where}
ORDER BY round(raw, {ROUND_DECIMALS}) DESC, doc_id ASC
LIMIT {k}
"""


# --------------------------------------------------------------------- #
# queries
# --------------------------------------------------------------------- #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: analyzed-match BM25 top-10 (capability B6/B10/B14)."""
    return _engine(spark, "/root/testdata/sf0.001").search("spark join merge", k=10)


def _q_match(spark, sf):
    return _engine(spark, sf).search("spark join merge", k=10)


def _q_bool_must(spark, sf):
    return _engine(spark, sf).search("table window batch", k=10, require_all=True)


def _q_must_not(spark, sf):
    return _engine(spark, sf).search("spark", k=10, must_not_text="window")


def _q_keyword(spark, sf):
    return _engine(spark, sf).search("merge sort", k=10, filters={"source": "src3"})


def _q_prefix(spark, sf):
    return _engine(spark, sf).search("query scan", k=10, prefix=("source", "src1"))


def _q_dedup_exists(spark, sf):
    # flagship dedup-check shape (B8): prefix + keyword eq, window 11,
    # existence = hits.total > 0 (reference: elasticsearch_utils.py:110-136)
    eng = _engine(spark, sf)
    win = eng.filter_only(
        filters={"lang": "en"}, prefix=("source", "src1"), limit=11
    )
    return win.agg(
        F.count(F.lit(1)).alias("total_hits"),
        (F.count(F.lit(1)) > 0).alias("found"),
    )


def _q_hits_total(spark, sf):
    eng = _engine(spark, sf)
    return eng.match_scores("spark").agg(F.count(F.lit(1)).alias("total_hits"))


def _q_term_stats(spark, sf):
    eng = _engine(spark, sf)
    return (
        eng.postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def _q_doc_stats(spark, sf):
    eng = _engine(spark, sf)
    return (
        eng.postings.select("doc_id", "dl").distinct()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dl"), ROUND_DECIMALS).alias("avgdl"),
        )
    )


def _q_token_count(spark, sf):
    return _docs(spark, sf).select(
        "doc_id", F.size(tokenize_expr("text")).alias("n_tokens")
    )


# --- compressed-index / block-max WAND path (B14) — same oracles as the
# --- exact path: the driver's hash compare IS the rank-identity gate.

def _q_wand_match(spark, sf):
    return _index(spark, sf).search("spark join merge", k=10)


def _q_wand_bool_must(spark, sf):
    return _index(spark, sf).search("table window batch", k=10, require_all=True)


def _q_wand_must_not(spark, sf):
    return _index(spark, sf).search("spark", k=10, must_not_text="window")


def _q_wand_filtered(spark, sf):
    return _index(spark, sf).search(
        "merge sort", k=10, filters={"source": "src3"}
    )


def _q_wand_prefix(spark, sf):
    return _index(spark, sf).search("query scan", k=10, prefix=("source", "src1"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_match_topk": _q_match,
        "bm25_bool_must": _q_bool_must,
        "bm25_must_not": _q_must_not,
        "bm25_keyword_filter": _q_keyword,
        "bm25_prefix_filter": _q_prefix,
        "flagship_dedup_exists": _q_dedup_exists,
        "hits_total_match": _q_hits_total,
        "term_stats_top20": _q_term_stats,
        "doc_stats": _q_doc_stats,
        "token_count": _q_token_count,
        "wand_match_topk": _q_wand_match,
        "wand_bool_must": _q_wand_bool_must,
        "wand_must_not": _q_wand_must_not,
        "wand_keyword_filter": _q_wand_filtered,
        "wand_prefix_filter": _q_wand_prefix,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_match_topk": _bm25_oracle("spark join merge", k=10),
        "bm25_bool_must": _bm25_oracle("table window batch", k=10, require_all=True),
        "bm25_must_not": _bm25_oracle("spark", k=10, must_not_text="window"),
        "bm25_keyword_filter": _bm25_oracle("merge sort", k=10, filters={"source": "src3"}),
        "bm25_prefix_filter": _bm25_oracle("query scan", k=10, prefix=("source", "src1")),
        "flagship_dedup_exists": """
SELECT count(*) AS total_hits, count(*) > 0 AS found FROM (
  SELECT doc_id FROM documents
  WHERE lang = 'en' AND source LIKE 'src1%' LIMIT 11
)
""",
        "hits_total_match": f"""
WITH {_TOKS_CTE}
SELECT count(DISTINCT doc_id) AS total_hits FROM toks WHERE term IN ('spark')
""",
        "term_stats_top20": f"""
WITH {_TOKS_CTE}
SELECT term, count(*)::BIGINT AS df, sum(cnt)::BIGINT AS cf FROM (
  SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2
) GROUP BY term ORDER BY df DESC, term ASC LIMIT 20
""",
        "doc_stats": f"""
WITH {_TOKS_CTE}
SELECT count(*)::BIGINT AS n_docs, round(avg(dl), {ROUND_DECIMALS}) AS avgdl FROM dl
""",
        "token_count": f"""
SELECT doc_id, len({duckdb_tokens_sql('text')})::INT AS n_tokens FROM documents
""",
        "wand_match_topk": _bm25_oracle("spark join merge", k=10),
        "wand_bool_must": _bm25_oracle("table window batch", k=10, require_all=True),
        "wand_must_not": _bm25_oracle("spark", k=10, must_not_text="window"),
        "wand_keyword_filter": _bm25_oracle("merge sort", k=10, filters={"source": "src3"}),
        "wand_prefix_filter": _bm25_oracle("query scan", k=10, prefix=("source", "src1")),
    }
