"""Shared sorted-array pair expansion.

One definition of the tricky slice arithmetic (review r5: the identical
expression lived verbatim in graph.cooccurrence_edges and
dedup.minhash_lsh_candidates — a fix to one would silently miss the
other).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_array_pairs(arr_col: str, a_name: str, b_name: str) -> Column:
    """Explode a SORTED array column into all unordered pairs as structs
    (a_name < b_name by the array order). ``slice`` is 1-based while the
    transform lambda index ``i`` is 0-based, so element i pairs with the
    tail starting at position i + 2 — each pair emitted exactly once.
    Runs entirely JVM-side; quadratic in the array length, so callers
    cap group sizes first (group_cap / bucket_cap)."""
    return F.explode(F.expr(
        f"flatten(transform({arr_col}, (x, i) ->"
        f" transform(slice({arr_col}, i + 2, size({arr_col})),"
        f" y -> struct(x AS {a_name}, y AS {b_name}))))"))
