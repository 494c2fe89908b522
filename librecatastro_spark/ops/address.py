"""Address-string field extraction — the A14 scalar suite, re-expressed as
pure Catalyst regex/string expressions (reference:
src/librecatastro/domain/address.py:16-196, which parses one
`full_address` string into 13 nullable fields).

Reference semantics modeled exactly (address.py:51-84):
  * the string splits into first/second "lines" at the '####' separator
    (HTML sources) or, absent that, at the FIRST 5-digit postal code
    (XML sources); with neither, both lines are the whole string.
  * street is an alias of first_line (address.py:86-88).
  * doorway/floor/door (Es:/Pl:/Pt:, address.py:90-127) and the rural
    site/lot (Polígono/Parcela, address.py:129-153) are matched within the
    FIRST line only, with the reference's `([-a-zA-Z0-9]+)` capture.
  * cp (address.py:155-167), province_parentheses/province (:181-192) and
    city = second_line minus province-parens minus separator minus cp
    (:169-179) come from the SECOND line.

Formats handled (same shapes as the reference's tests):
  "CL TESTTEST 17 03005 AJALVIR (MURCIA)"            urban w/ CP
  "CL NOCP 5 SOMEWHERE (MADRID)"                      no CP (parser_html_tests.py:34-38)
  "... Es:1 Pl:02 Pt:A ..."                           doorway/floor/door
  "Polígono 12 Parcela 345 ... (CÁCERES)"             rural site/lot
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "####"  # reference config['separator'] (src/settings.py)
_CP = "([0-9]{5})"
_PROV = r"\(([^)]+)\)"
_TOK = "([-a-zA-Z0-9]+)"  # reference capture class (address.py:96 etc.)


def _c(addr: Column | str) -> Column:
    return F.col(addr) if isinstance(addr, str) else addr


def _nullable(c: Column) -> Column:
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def _split_pos(c: Column) -> Column:
    """1-based split position: '####' if present, else the first 5-digit
    CP, else 0 (no split)."""
    sep = F.locate(_SEP, c)
    cp = F.regexp_instr(c, F.lit("[0-9]{5}"))
    return F.when(sep > 0, sep).otherwise(cp)


def first_line_expr(addr: Column | str) -> Column:
    c = _c(addr)
    pos = _split_pos(c)
    return F.when(pos > 0, F.trim(c.substr(F.lit(1), pos - 1))).otherwise(F.trim(c))


def second_line_expr(addr: Column | str) -> Column:
    c = _c(addr)
    pos = _split_pos(c)
    return F.when(pos > 0, F.trim(c.substr(pos, F.length(c)))).otherwise(F.trim(c))


def extract_cp(addr: Column | str) -> Column:
    return _nullable(F.regexp_extract(second_line_expr(addr), _CP, 1))


def extract_province_parentheses(addr: Column | str) -> Column:
    return _nullable(
        F.regexp_extract(second_line_expr(addr), r"(\([^)]+\))", 1)
    )


def extract_province(addr: Column | str) -> Column:
    return _nullable(F.regexp_extract(second_line_expr(addr), _PROV, 1))


def extract_doorway(addr: Column | str) -> Column:
    return _nullable(F.regexp_extract(first_line_expr(addr), f"Es:{_TOK}", 1))


def extract_floor(addr: Column | str) -> Column:
    return _nullable(F.regexp_extract(first_line_expr(addr), f"Pl:{_TOK}", 1))


def extract_door(addr: Column | str) -> Column:
    return _nullable(F.regexp_extract(first_line_expr(addr), f"Pt:{_TOK}", 1))


def extract_site(addr: Column | str) -> Column:
    return _nullable(
        F.regexp_extract(first_line_expr(addr), f"Polígono {_TOK}", 1)
    )


def extract_lot(addr: Column | str) -> Column:
    return _nullable(
        F.regexp_extract(first_line_expr(addr), f"Parcela {_TOK}", 1)
    )


def extract_street(addr: Column | str) -> Column:
    """Street is an alias of first_line (address.py:86-88)."""
    return _nullable(first_line_expr(addr))


def extract_city(addr: Column | str) -> Column:
    """City = second_line minus province-parens, minus separator, minus cp
    (address.py:169-179; each removal literal, applied only when present)."""
    second = second_line_expr(addr)
    pp = extract_province_parentheses(addr)
    cp = extract_cp(addr)
    base = F.when(pp.isNull(), second).otherwise(F.replace(second, pp, F.lit("")))
    base = F.replace(base, F.lit(_SEP), F.lit(""))
    base = F.when(cp.isNull(), base).otherwise(F.replace(base, cp, F.lit("")))
    return _nullable(F.trim(base))


def parse_address(addr: Column | str) -> Column:
    """All 13 reference fields as one struct — the Address-object analog
    (address.py to_json(): full_address, first_line, second_line, street,
    cp, city, province_parentheses, province, doorway, floor, door, site,
    lot)."""
    c = _c(addr)
    return F.struct(
        c.alias("full_address"),
        first_line_expr(c).alias("first_line"),
        second_line_expr(c).alias("second_line"),
        extract_street(c).alias("street"),
        extract_cp(c).alias("cp"),
        extract_city(c).alias("city"),
        extract_province_parentheses(c).alias("province_parentheses"),
        extract_province(c).alias("province"),
        extract_doorway(c).alias("doorway"),
        extract_floor(c).alias("floor"),
        extract_door(c).alias("door"),
        extract_site(c).alias("site"),
        extract_lot(c).alias("lot"),
    )


# ------------------------------------------------------------ DuckDB twins
# DuckDB has no regexp_instr; the twin finds the split point as
# strpos(full, first_cp_match) — identical whenever the CP's 5-digit string
# does not also appear earlier as a substring (true by construction for the
# gated fixtures, where all other numbers are < 4 digits).

def _sql_lines(col: str) -> str:
    """CTE fragment computing (full, first_line, second_line) from col."""
    return f"""
lines AS (
  SELECT *,
         CASE WHEN strpos({col}, '{_SEP}') > 0 THEN strpos({col}, '{_SEP}')
              WHEN regexp_extract({col}, '[0-9]{{5}}') <> ''
                THEN strpos({col}, regexp_extract({col}, '[0-9]{{5}}'))
              ELSE 0 END AS _pos
  FROM _addr_src
),
split AS (
  SELECT *,
         CASE WHEN _pos > 0 THEN trim(substring({col}, 1, _pos - 1))
              ELSE trim({col}) END AS first_line,
         CASE WHEN _pos > 0 THEN trim(substring({col}, _pos, length({col})))
              ELSE trim({col}) END AS second_line
  FROM lines
)
"""


def address_fields_sql() -> str:
    """SELECT-list fragment over `split` producing the extracted fields
    (same semantics as the Catalyst expressions above)."""
    return f"""
  first_line,
  second_line,
  nullif(first_line, '') AS street,
  nullif(regexp_extract(second_line, '{_CP}', 1), '') AS cp,
  nullif(trim(
    CASE WHEN regexp_extract(second_line, '{_CP}', 1) <> ''
         THEN replace(_city_base, regexp_extract(second_line, '{_CP}', 1), '')
         ELSE _city_base END), '') AS city,
  nullif(regexp_extract(second_line, '(\\([^)]+\\))', 1), '') AS province_parentheses,
  nullif(regexp_extract(second_line, '\\(([^)]+)\\)', 1), '') AS province,
  nullif(regexp_extract(first_line, 'Es:{_TOK}', 1), '') AS doorway,
  nullif(regexp_extract(first_line, 'Pl:{_TOK}', 1), '') AS "floor",
  nullif(regexp_extract(first_line, 'Pt:{_TOK}', 1), '') AS door,
  nullif(regexp_extract(first_line, 'Polígono {_TOK}', 1), '') AS site,
  nullif(regexp_extract(first_line, 'Parcela {_TOK}', 1), '') AS lot
"""


def city_base_sql() -> str:
    """Expression for the city removal base (second_line minus
    province-parens minus separator), to alias as _city_base."""
    return f"""
  replace(
    CASE WHEN regexp_extract(second_line, '(\\([^)]+\\))', 1) <> ''
         THEN replace(second_line, regexp_extract(second_line, '(\\([^)]+\\))', 1), '')
         ELSE second_line END,
    '{_SEP}', '')
"""
