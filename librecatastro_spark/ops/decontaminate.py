"""Benchmark decontamination: flag training documents that share any
n-token n-gram with an evaluation/benchmark set.

The standard pretraining hygiene step (n-gram-overlap decontamination as
popularized by the GPT-3 and Llama reports): an eval suite is tiny next
to the corpus, so its distinct n-grams form a broadcastable probe set;
any training doc containing one of those n-grams is contaminated and
dropped (or flagged for audit).

Plan shape at 100 TB:
  * the bench side collapses to DISTINCT n-grams — eval suites are MBs,
    so this side always fits a broadcast hash join (no shuffle of the
    corpus on the join);
  * the corpus side explodes its per-doc DISTINCT n-grams (set
    semantics: one hit per distinct n-gram, however often it repeats),
    LEFT SEMI joins the broadcast probe set, and aggregates hit counts
    per doc — ONE shuffle keyed by doc_id, partially aggregated
    map-side;
  * docs with zero n-grams or zero hits are preserved via a final left
    join against the doc spine (broadcast-sized per partition after the
    semi join? no — the spine is the corpus, so this is the same
    doc_id-keyed exchange reused by AQE).

Reference parity note: the reference has no decontamination (it is a
cadastral scraper), but its dedup-by-fingerprint resume logic
(src/librecatastro/scrapping/scrapper.py check_if_address_present) is
the same "is this content already known elsewhere" probe — here the
"known" set is the benchmark rather than the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr, shingles_sql


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct n-gram probe set of the benchmark frame: one column
    ``sh``. Distinct-collapsed so the broadcast payload is minimal."""
    return (
        bench.select(F.explode(shingles_expr(text_col, n)).alias("sh"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_ngrams, n_contaminated, contaminated) for EVERY doc in
    ``docs``: n_ngrams = distinct n-grams in the doc, n_contaminated =
    how many of those also occur anywhere in ``bench``, contaminated =
    n_contaminated > 0. Deterministic, no thresholds — the caller picks
    drop vs audit."""
    probe = F.broadcast(benchmark_ngrams(bench, text_col, n))
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles_expr(text_col, n)).alias("_sh"),
    )
    hits = (
        doc_sh.select("doc_id", F.explode("_sh").alias("sh"))
        .join(probe, "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        doc_sh.select("doc_id", F.size("_sh").alias("n_ngrams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def decontaminate_sql(
    bench_pred: str, text_col: str = "text", n: int = 5
) -> str:
    """DuckDB twin over ``documents``: ``bench_pred`` is the SQL
    predicate selecting the benchmark rows (the Spark side passes the
    same filter over the same table, so the probe sets are identical)."""
    sh = shingles_sql(text_col, n)
    return f"""
WITH probe AS (
  SELECT DISTINCT unnest({sh}) AS sh FROM documents WHERE {bench_pred}
),
doc_sh AS (
  SELECT doc_id, list_distinct({sh}) AS shs FROM documents
),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM (SELECT doc_id, unnest(shs) AS sh FROM doc_sh) e
  JOIN probe USING (sh)
  GROUP BY doc_id
)
SELECT d.doc_id,
       len(d.shs)::BIGINT AS n_ngrams,
       coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated
FROM doc_sh d LEFT JOIN hits h USING (doc_id)"""
