"""PII scrubbing for training-data pipelines: detect and redact emails,
IPv4 addresses, and long digit runs (phone-ish) with placeholder tokens.

The standard pre-training privacy pass (as shipped in public curation
stacks like BigScience ROOTS / Dolma): regex families, not NER — cheap,
deterministic, and runs entirely inside Catalyst codegen (regexp_count /
regexp_replace are JVM intrinsics; no Python in the hot path, no
shuffle — a pure narrow projection that scales linearly at 100 TB).

Pattern portability: every pattern below avoids lookarounds and
backreferences, so Java's regex (Spark), RE2 (DuckDB) and CPython sre
compile it with identical semantics — the oracle twin is exact by
construction (same trick as analyzer._phrase_body).

Redaction order is fixed (EMAIL → IP → PHONE) and REPLACEMENTS ARE
SEQUENTIAL: each later pattern runs over the previous pass's output, so
a phone-like digit run inside an already-redacted email can't double
count. Placeholders contain no digits/@, so they are fix-points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # local@domain.tld (case-insensitive via explicit classes; tld >= 2)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted quad, 1-3 digits per octet, word-bounded
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # 9+ digit run, optional leading +, word-bounded (phone-ish)
    ("phone", r"\+?\b\d{9,15}\b", "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_email, n_ip, n_phone): per-pattern hit
    counts and the fully redacted text. Counts are measured on the text
    AS EACH PASS SEES IT (sequential semantics above)."""
    cur = F.col(text_col)
    cols = [F.col(id_col).alias("doc_id")]
    counts = []
    for name, pat, ph in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, ph)
    return docs.select(*cols, cur.alias("clean_text"), *counts)


def redact_pii_sql(
    id_col: str = "doc_id", text_col: str = "text", source: str = "documents"
) -> str:
    """Full SELECT — DuckDB twin over ``source`` (RE2 'g' flag for
    global replace; same sequential pass order)."""
    cur = text_col
    count_exprs = []
    for name, pat, ph in PII_PATTERNS:
        count_exprs.append(
            f"len(regexp_extract_all({cur}, '{pat}'))::INTEGER AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{ph}', 'g')"
    counts = ", ".join(count_exprs)
    return (
        f"SELECT {id_col} AS doc_id, {cur} AS clean_text, {counts} "
        f"FROM {source}"
    )
