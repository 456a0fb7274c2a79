"""String scalar helpers (reference SURVEY.md §2.8 string table).

All JVM built-ins — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coded_id(prefix: str, col: Column | str, width: int = 6) -> Column:
    """Zero-padded code like ``CLI-000042``
    (reference `complete_dimension_builder.py:377`)."""
    return F.concat(F.lit(prefix), F.lpad((F.col(col) if isinstance(col, str) else col).cast("string"), width, "0"))


def name_or_default(col: Column | str, default_prefix: str, id_col: Column | str) -> Column:
    """``COALESCE(NULLIF(TRIM(name),''), 'Producto '||id)``
    (reference `complete_dimension_builder.py:207, :358, :512`)."""
    c = F.col(col) if isinstance(col, str) else col
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.coalesce(
        F.nullif(F.trim(c), F.lit("")),
        F.concat(F.lit(default_prefix), i.cast("string")),
    )


def full_name(first: Column | str, last: Column | str, fallback: Column | str) -> Column:
    """``COALESCE(NULLIF(CONCAT(first,' ',last),' '), username)``
    (reference `complete_dimension_builder.py:156`)."""
    f = F.col(first) if isinstance(first, str) else first
    l_ = F.col(last) if isinstance(last, str) else last
    fb = F.col(fallback) if isinstance(fallback, str) else fallback
    joined = F.concat_ws(" ", F.coalesce(f, F.lit("")), F.coalesce(l_, F.lit("")))
    return F.coalesce(F.nullif(F.trim(joined), F.lit("")), fb)


def first_token(col: Column | str, sep: str = " ") -> Column:
    """Brand extraction — first whitespace token
    (reference `complete_dimension_builder.py:231`)."""
    return F.split(F.col(col) if isinstance(col, str) else col, sep).getItem(0)


def extract_int(col: Column | str) -> Column:
    """First integer embedded in a string: ``ENV001``→1, ``5-7 días``→5
    (reference `complete_dimension_builder.py:631, :637-639`)."""
    return F.regexp_extract(F.col(col) if isinstance(col, str) else col, r"(\d+)", 1).cast("int")


def contains_ci(col: Column | str, needle: str) -> Column:
    """Case-insensitive contains (reference `complete_fact_builder.py:747-748`)."""
    return F.upper(F.col(col) if isinstance(col, str) else col).contains(needle.upper())


def truthy_bool(col: Column | str) -> Column:
    """Truthy-string → boolean coercion
    (reference `complete_dimension_builder.py:843-846`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c.cast("string"))).isin("true", "1", "t", "yes", "si", "sí")


def auto_id(*cols: Column | str, length: int = 8) -> Column:
    """Deterministic short id: md5 of the concatenated inputs
    (reference `core/data_validator.py:333-337` uses md5 of now() — we make
    it a pure function of the row so re-runs are idempotent)."""
    parts = [(F.col(c) if isinstance(c, str) else c).cast("string") for c in cols]
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, length)
