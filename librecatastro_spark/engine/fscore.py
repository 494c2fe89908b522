"""Shared field-factor math for ES function_score — frozen once.

ES's ``function_score`` with ``field_value_factor`` rescores a match by a
function of a numeric doc field:  factor_fn(field) combined with the query
score via ``boost_mode`` (multiply | sum). The modifier set reproduced here
is the ES trio that needs no per-doc state: none / log1p / sqrt.

One definition serves every path — the exact Catalyst engine, the
compressed-index numpy kernel, and the DuckDB oracle twin — so a modifier
can never drift between engines. Cross-engine float reproducibility
follows the repo's rounding protocol: the BM25 sum is rounded FIRST
(ROUND_DECIMALS, as every path already does), the field factor is applied
to the rounded score, and the combined score is rounded again; ln/sqrt
agree across Spark, numpy and DuckDB to well under the rounding quantum.

Null field values count as 0.0 (ES's ``missing`` parameter, pinned to 0)
— documented, and mirrored in the SQL twin via coalesce.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MODIFIERS = ("none", "log1p", "sqrt")


def _check(modifier: str, boost_mode: str) -> None:
    if modifier not in MODIFIERS:
        raise ValueError(f"modifier must be one of {MODIFIERS}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError("boost_mode must be 'multiply' or 'sum'")


def field_factor_expr(col: Column, modifier: str, factor: float) -> Column:
    # try_cast: a malformed/non-numeric field value is a missing value
    # (-> 0.0 via coalesce), not an ANSI cast error — matching the numpy
    # path's nan_to_num and the SQL twin's TRY_CAST exactly
    v = F.coalesce(col.try_cast("double"), F.lit(0.0)) * F.lit(float(factor))
    if modifier == "log1p":
        return F.log1p(v)
    if modifier == "sqrt":
        return F.sqrt(v)
    return v


def field_factor_np(v: np.ndarray, modifier: str, factor: float) -> np.ndarray:
    v = np.nan_to_num(v.astype(np.float64), nan=0.0) * float(factor)
    if modifier == "log1p":
        return np.log1p(v)
    if modifier == "sqrt":
        return np.sqrt(v)
    return v


def field_factor_sql(col: str, modifier: str, factor: float) -> str:
    v = f"(coalesce(TRY_CAST({col} AS DOUBLE), 0.0) * {float(factor)!r})"
    if modifier == "log1p":
        return f"ln(1.0 + {v})"
    if modifier == "sqrt":
        return f"sqrt({v})"
    return v


def combine_expr(score: Column, fac: Column, boost_mode: str) -> Column:
    return score * fac if boost_mode == "multiply" else score + fac


def combine_np(score: np.ndarray, fac: np.ndarray, boost_mode: str) -> np.ndarray:
    return score * fac if boost_mode == "multiply" else score + fac


def combine_sql(score: str, fac: str, boost_mode: str) -> str:
    op = "*" if boost_mode == "multiply" else "+"
    return f"({score} {op} {fac})"
