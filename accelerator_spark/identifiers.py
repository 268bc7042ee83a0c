"""Single-identifier quoting, shared (review r5b: the same backtick
escape lived in dataset.py, functions/conversions.py, and twice inline
in sources/csv.py — the exact duplication pairs.py was extracted to
avoid)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quote_ident(name: str) -> str:
    """Backtick-wrapped single identifier for DDL / schema strings;
    embedded backticks escape by doubling."""
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str) -> Column:
    """F.col with the name forced to a SINGLE identifier — a dotted CSV
    header ('price.usd') otherwise parses as a struct path."""
    return F.col(quote_ident(name))
