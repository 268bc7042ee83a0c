"""Analytical operators: skyline (Pareto frontier) and robust-statistics
helpers.

New surface beyond the reference (which has no relational operators at
all — SURVEY.md §2.6/§2.7); shapes chosen for the 100 TB regime.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(df: DataFrame, minimize: list[str], maximize: list[str]) -> DataFrame:
    """Pareto frontier: rows not dominated by any other row. Row q
    dominates row p if q is <= p on every ``minimize`` column, >= on
    every ``maximize`` column, and strictly better on at least one.

    Distributed shape (the classic two-phase skyline):
    1. map phase — each partition computes its LOCAL skyline in an Arrow
       batch loop (O(n_local * |local skyline|), no shuffle). A row
       dominated locally is dominated globally, so this loses nothing.
    2. reduce phase — the (small) union of local skylines is
       self-compared once to drop cross-partition dominated rows.

    At 100 TB phase 1 reduces billions of rows to ~thousands of
    candidates (skylines grow logarithmically for independent dims);
    phase 2's quadratic check runs on candidates only. Output is the
    exact skyline, independent of partitioning."""
    cols = df.columns
    mins, maxs = list(minimize), list(maximize)
    if not mins and not maxs:
        # fail clearly at call time, not as an IndexError inside the
        # domination-predicate build (review r4)
        raise ValueError("skyline: at least one minimize/maximize "
                         "column is required")

    def _local(batches: Iterator) -> Iterator:
        import pandas as pd
        parts = [pdf for pdf in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        keep = _pareto_mask(pdf, mins, maxs)
        yield pdf[keep]

    schema = df.schema
    # candidates are referenced on BOTH sides of the phase-2 self-join;
    # truncate lineage so the full-input local-skyline scan runs once,
    # not twice (review r4 — the candidate set is ~thousands of rows)
    cands = df.mapInPandas(_local, schema=schema).localCheckpoint(eager=True)

    # phase 2: candidates are small — broadcast self anti-join on the
    # domination predicate removes the cross-partition dominated rows
    strict = [
        *[(F.col(f"q.{c}") < F.col(f"p.{c}")) for c in mins],
        *[(F.col(f"q.{c}") > F.col(f"p.{c}")) for c in maxs],
    ]
    weak = [
        *[(F.col(f"q.{c}") <= F.col(f"p.{c}")) for c in mins],
        *[(F.col(f"q.{c}") >= F.col(f"p.{c}")) for c in maxs],
    ]
    dominated = weak[0]
    for w in weak[1:]:
        dominated = dominated & w
    any_strict = strict[0]
    for s in strict[1:]:
        any_strict = any_strict | s
    p, q = cands.alias("p"), F.broadcast(cands.alias("q"))
    return (p.join(q, dominated & any_strict, "left_anti")
            .select(*[F.col(c) for c in cols]))


def _pareto_mask(pdf, mins: list[str], maxs: list[str]):
    import numpy as np
    n = len(pdf)
    m = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in mins]
        + [-pdf[c].to_numpy(dtype=float) for c in maxs])
    keep = np.ones(n, dtype=bool)
    # sort by sum so likely dominators come first; quadratic fallback is
    # bounded by the running skyline size, not n
    order = np.argsort(m.sum(axis=1), kind="stable")
    sky: list[int] = []
    for i in order:
        dominated = False
        for j in sky:
            diff = m[j] - m[i]
            if (diff <= 0).all() and (diff < 0).any():
                dominated = True
                break
        if dominated:
            keep[i] = False
        else:
            sky.append(i)
    return keep


def winsorize(df: DataFrame, value_col: str, group_cols: list[str],
              lower: float = 0.05, upper: float = 0.95) -> DataFrame:
    """Clamp ``value_col`` to its per-group exact [lower, upper]
    percentile band (linear interpolation, matching SQL
    PERCENTILE_CONT). Adds column ``<value_col>_winsor``.

    One agg pass computes the per-group cut points (tiny result,
    broadcast back); the clamp itself is a map-only expression — no
    second shuffle of the data.

    The contract is add-a-column, never drop-rows: the cut-point join
    is NULL-SAFE on every group column (a plain equi-join silently
    drops rows whose group key is NULL) and a LEFT join — a row with
    no cut points keeps its value unclamped."""
    cuts = df.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(lower)).alias("_lo"),
        F.percentile(F.col(value_col), F.lit(upper)).alias("_hi"))
    cuts = cuts.select(
        *[F.col(c).alias(f"_g_{c}") for c in group_cols], "_lo", "_hi")
    cond = None
    for c in group_cols:
        e = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        cond = e if cond is None else cond & e
    out = df.join(F.broadcast(cuts), cond, "left")
    # NULL values stay NULL (greatest/least skip NULLs, which would
    # otherwise fabricate the lower cut point for a NULL input). A row
    # with no cut points (missed left join) keeps its value: greatest/
    # least SKIP the NULL bounds rather than propagating them.
    clamped = F.when(F.col(value_col).isNull(), F.lit(None)).otherwise(
        F.least(F.greatest(F.col(value_col), F.col("_lo")),
                F.col("_hi")))
    return (out.withColumn(f"{value_col}_winsor", clamped)
            .drop("_lo", "_hi", *[f"_g_{c}" for c in group_cols]))
