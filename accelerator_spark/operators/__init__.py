"""Operator library — each module maps a SURVEY.md §2 inventory row (or a
north-star extension) onto idiomatic PySpark."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(vals) -> Column:
    """Array<double> literal built in ONE Py4J round-trip.

    ``F.lit(list)`` / ``F.array(*[F.lit(x) ...])`` cost one JVM call
    PER ELEMENT (~45 ms for 64 doubles, measured warm) — the dominant
    driver-side cost of every model-literal plan (k-means assignment,
    logreg scoring, LSH hyperplanes). A SQL ``array(...)`` string is
    parsed JVM-side in one call (~0.7 ms) and ``repr(float)`` is the
    shortest round-trip form, so the parsed doubles are bit-identical
    (verified incl. subnormals-adjacent, negative zero, exponents).
    Finite values only — callers hold model weights, never NaN/inf."""
    return F.expr(
        "array(" + ",".join(repr(float(x)) + "D" for x in vals) + ")")
