"""Bounded sequential probe loop (A19) — the reference walks street
numbers 1, 2, 3, … per street and gives up after a fixed number of
consecutive misses (reference: src/librecatastro/scrapping/parsers/
parser_xml.py:154-188, `MAX_CONSECUTIVE_MISSES`-style early stop).

Distributed re-expression: the sequential "probe until k consecutive
misses" loop over each key's integer space is equivalent to a CLOSED FORM
over the present values — sort each key's values, compute the gap to the
predecessor (``lag``), and keep everything before the first gap ≥ k.
That turns a per-key O(max value) imperative loop into two window
functions over O(present values) rows: no sequence()+explode fan-out of
the whole probe space (which at 100 TB would materialize billions of
phantom probe rows), no per-row Python, and the shuffle is a single
hash partition by key. Ties/duplicates are collapsed with distinct
first so a repeated value cannot fake a zero gap."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_probe_scan(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_misses: int = 10,
) -> DataFrame:
    """For each key, return the present integer values a sequential
    1,2,3,… prober would reach before hitting ``max_misses`` consecutive
    absent values. Output: (key_col, value_col) rows, exact analog of the
    reference's probe loop result set."""
    vals = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("int").alias("n"),
        )
        .where(F.col("n") >= 1)
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("n")
    gap = F.col("n") - F.lag("n", 1, 0).over(w) - 1
    cum_bad = F.sum(
        F.when(gap >= max_misses, F.lit(1)).otherwise(F.lit(0))
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        vals.withColumn("_bad", cum_bad)
        .where(F.col("_bad") == 0)
        .select(F.col("key").alias(key_col), F.col("n").alias(value_col))
    )


def bounded_probe_scan_sql(
    table: str, key_col: str, value_col: str, max_misses: int = 10
) -> str:
    """DuckDB twin of bounded_probe_scan (same window formulation)."""
    return f"""
WITH p AS (
  SELECT DISTINCT {key_col} AS key, {value_col}::INT AS n
  FROM {table} WHERE {value_col}::INT >= 1
),
g AS (
  SELECT key, n,
         n - lag(n, 1, 0) OVER (PARTITION BY key ORDER BY n) - 1 AS gap
  FROM p
),
f AS (
  SELECT key, n,
         sum(CASE WHEN gap >= {max_misses} THEN 1 ELSE 0 END)
           OVER (PARTITION BY key ORDER BY n ROWS UNBOUNDED PRECEDING) AS nbad
  FROM g
)
SELECT key AS {key_col}, n AS {value_col} FROM f WHERE nbad = 0
"""
