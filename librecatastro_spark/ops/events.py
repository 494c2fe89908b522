"""Event-time batch aggregations over the ``events`` table — the batch
twins of streaming/windowed.py.

``date_histogram`` is ES's calendar-interval date_histogram (day /
month buckets follow the calendar, unlike the fixed-width tumbling
windows of windowed_event_counts — a 31-day month is one bucket here
and 4.43 windows there). Plan shape at 100 TB: one groupBy keyed by
(bucket[, event_type]) with map-side partial aggregation — the shuffle
carries O(buckets × types) partials per task, never events; date_trunc
is a codegen intrinsic, so the bucket key costs no Python and no
allocation beyond the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..bm25 import ROUND_DECIMALS

_INTERVALS = ("hour", "day", "week", "month", "year")


def date_histogram(
    events: DataFrame,
    interval: str = "day",
    ts_col: str = "ts",
    value_col: str = "value",
    by_type: bool = False,
) -> DataFrame:
    """(bucket[, event_type], cnt, sum_value): event counts and value
    sums per calendar bucket, bucket ASC (ES date_histogram with
    min_doc_count=1 — only non-empty buckets appear)."""
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {_INTERVALS}")
    keys = [F.date_trunc(interval, F.col(ts_col)).alias("bucket")]
    order = [F.asc("bucket")]
    if by_type:
        keys.append(F.col("event_type"))
        order.append(F.asc("event_type"))
    return (
        events.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(value_col), ROUND_DECIMALS).alias("sum_value"),
        )
        .orderBy(*order)
    )


def date_histogram_sql(
    interval: str = "day",
    ts_col: str = "ts",
    value_col: str = "value",
    by_type: bool = False,
) -> str:
    """Full SELECT — DuckDB twin over ``events`` (date_trunc semantics
    agree between Spark and DuckDB for these calendar intervals)."""
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {_INTERVALS}")
    # ::TIMESTAMP — DuckDB's date_trunc returns DATE for day-and-coarser
    # intervals where Spark always returns TIMESTAMP
    key = f"date_trunc('{interval}', {ts_col})::TIMESTAMP"
    extra = ", event_type" if by_type else ""
    group = "1, 2" if by_type else "1"
    return f"""
SELECT {key} AS bucket{extra},
       count(*)::BIGINT AS cnt,
       round(sum({value_col}), {ROUND_DECIMALS}) AS sum_value
FROM events GROUP BY {group} ORDER BY {group}"""
