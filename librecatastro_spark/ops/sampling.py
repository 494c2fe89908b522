"""Deterministic stratified sampling — the domain-mixing primitive.

A pretraining pipeline rarely trains on the corpus's natural mix: it
up/down-weights strata (language, source domain, quality band) to a
target recipe. ``df.sample()`` can't gate that — its output depends on
partition layout and Spark's sampler internals — so the sample here is a
pure FUNCTION of the row key: a doc survives iff

    bucket(doc_id) = int(first 8 hex chars of md5("{doc_id}:{salt}")) % 1_000_000
    bucket < round(rate[stratum] * 1_000_000)

md5 is bit-identical across Spark, DuckDB and Python, so the same rows
survive on any engine, any parallelism, any day — which is what makes a
sampling pass auditable at 100 TB (re-running the recipe reproduces the
exact training set; changing `salt` redraws it). Filter + hash are pure
Catalyst intrinsics (md5/substring/conv — whole-stage codegen over the
scan, no shuffle, no UDF); strata without a configured rate default to
rate 0 (dropped), matching the explicit-recipe semantics of the Pile /
Dolma mixing tables.

Reference analog: the random-sampling search A24
(src/librecatastro/scrapping/searchers/coordinates_searcher.py:205-253),
made deterministic and stratified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000


def _bucket_expr(id_col: str, salt: str):
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _MOD


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    salt: str = "mix1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows surviving the recipe, plus their hash bucket:
    input columns + ``(bucket)``. See module docstring for semantics."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1]")
    # build the CASE chain in sorted stratum order so the Spark plan and
    # the SQL twin are the same decision list
    expr = None
    for s in sorted(rates):
        clause = (F.col(stratum_col) == F.lit(s), F.lit(int(round(rates[s] * _MOD))))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    thr = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    b = _bucket_expr(id_col, salt)
    return docs.withColumn("bucket", b.cast("long")).where(F.col("bucket") < thr)


def stratified_sample_sql(
    rates: dict[str, float],
    stratum_col: str = "lang",
    salt: str = "mix1",
    id_col: str = "doc_id",
    cols: str = "doc_id, text, lang, source, n_chars",
) -> str:
    """DuckDB twin of stratified_sample over the ``documents`` view."""
    whens = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(round(rates[s] * _MOD))}"
        for s in sorted(rates)
    )
    return f"""
WITH b AS (
  SELECT {cols},
         (('0x' || substr(md5({id_col}::VARCHAR || ':{salt}'), 1, 8))::BIGINT
          % {_MOD})::BIGINT AS bucket
  FROM documents
)
SELECT * FROM b
WHERE bucket < (CASE {whens} ELSE 0 END)
"""
