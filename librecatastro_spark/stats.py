"""Document & term statistics — the single shuffle pass of the build.

ES maintains per-shard doc counts, doc lengths, and term document/collection
frequencies to score BM25; we compute them once from the corpus and
broadcast the tiny global part (N, avgdl) as driver constants, and df/cf as
a term-keyed table that is co-partitioned with the postings (same shuffle
key ``term``), so the posting build pays no extra shuffle for stats.

Flow (exactly two wide exchanges end-to-end, SURVEY.md §4):
  docs --tokenize (codegen)--> posexplode --> (doc_id, term)
       --groupBy(doc_id, term)--> tf              [shuffle 1: by (doc_id,term)]
       --window over doc_id partitions--> dl     (reuses shuffle 1 ordering)
       --groupBy(term)--> df, cf                  [shuffle 2: by term]
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzer import tokenize_expr


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """(doc_id, term) — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(text_col)).alias("term"),
    )


def term_freqs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """Postings with per-document length denormalized in: (doc_id, term, tf, dl).

    dl = size(token array) is computed BEFORE the explode (free, no
    shuffle), so the whole pass costs exactly ONE exchange — the
    groupBy(doc_id, term). This is the only full-corpus shuffle of the
    index build.
    """
    ex = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_expr(text_col).alias("_toks")
    ).select(
        "doc_id",
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    return ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl) — distinct projection of the denormalized postings."""
    return postings.select("doc_id", "dl").distinct()


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — document frequency and collection frequency."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_stats(postings: DataFrame) -> CorpusStats:
    """Global N and avgdl in one small action over (doc_id, dl)."""
    row = doc_lengths(postings).agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
