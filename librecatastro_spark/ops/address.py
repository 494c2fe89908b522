"""Address-string field extraction — the A14 scalar suite, re-expressed as
pure Catalyst regex expressions (reference:
src/librecatastro/domain/address.py:16-196, which regex-parses one
`full_address` string into 13 nullable fields).

Reference formats handled (same shapes as the reference's tests):
  "CL TESTTEST 17 03005 AJALVIR (MURCIA)"            urban w/ CP
  "CL NOCP 5 SOMEWHERE (MADRID)"                      no CP (parser_html_tests.py:34-38)
  "... Es:1 Pl:02 Pt:A ..."                           doorway/floor/door (address.py:90-127)
  "Polígono 12 Parcela 345 ... (CÁCERES)"             rural site/lot (address.py:129-153)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CP = "([0-9]{5})"
_PROV = r"\(([^)]+)\)"


def _nullable(c: Column) -> Column:
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def extract_cp(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, _CP, 1))


def extract_province(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, _PROV, 1))


def extract_doorway(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, r"Es:([^ ]+)", 1))


def extract_floor(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, r"Pl:([^ ]+)", 1))


def extract_door(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, r"Pt:([^ ]+)", 1))


def extract_site(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, r"Pol[ií]gono ([0-9]+)", 1))


def extract_lot(addr: Column | str) -> Column:
    c = F.col(addr) if isinstance(addr, str) else addr
    return _nullable(F.regexp_extract(c, r"Parcela ([0-9]+)", 1))


def extract_street(addr: Column | str) -> Column:
    """First line: everything before the CP if present, else before the
    province parenthesis (address.py:51-66 line-split semantics)."""
    c = F.col(addr) if isinstance(addr, str) else addr
    before_cp = F.trim(F.regexp_extract(c, f"^(.*?){_CP}", 1))
    before_prov = F.trim(F.regexp_extract(c, r"^(.*?)\(", 1))
    return _nullable(
        F.when(F.regexp_extract(c, _CP, 1) != "", before_cp).otherwise(before_prov)
    )


def extract_city(addr: Column | str) -> Column:
    """City = residual between the CP and the province parenthesis
    (address.py:169-179: city is what remains after removing the other
    pieces)."""
    c = F.col(addr) if isinstance(addr, str) else addr
    after_cp = F.trim(F.regexp_extract(c, f"{_CP}" + r"([^(]*)", 2))
    return _nullable(after_cp)


def parse_address(addr: Column | str) -> Column:
    """All extracted fields as one struct — the Address-object analog."""
    c = F.col(addr) if isinstance(addr, str) else addr
    return F.struct(
        c.alias("full_address"),
        extract_street(c).alias("street"),
        extract_cp(c).alias("cp"),
        extract_city(c).alias("city"),
        extract_province(c).alias("province"),
        extract_doorway(c).alias("doorway"),
        extract_floor(c).alias("floor"),
        extract_door(c).alias("door"),
        extract_site(c).alias("site"),
        extract_lot(c).alias("lot"),
    )


# DuckDB twins (regexp_extract group semantics match)

def extract_cp_sql(col: str) -> str:
    return f"nullif(regexp_extract({col}, '{_CP}', 1), '')"


def extract_province_sql(col: str) -> str:
    return f"nullif(regexp_extract({col}, '\\(([^)]+)\\)', 1), '')"


def extract_city_sql(col: str) -> str:
    return f"nullif(trim(regexp_extract({col}, '{_CP}([^(]*)', 2)), '')"
