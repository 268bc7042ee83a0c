"""Analytical operators: skyline (Pareto frontier) and robust-statistics
helpers.

New surface beyond the reference (which has no relational operators at
all — SURVEY.md §2.6/§2.7); shapes chosen for the 100 TB regime.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import lit_double_array


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


def logreg_train(df: DataFrame, vec_col: str = "embedding",
                 label_col: str = "label", iters: int = 10,
                 lr: float = 1.0, weight_dp: int = 6):
    """Distributed logistic-regression training by full-batch gradient
    descent — the quality-classifier primitive of a curation pipeline
    (train a filter on labeled docs, score the corpus with the learned
    weights; scoring is ``sigmoid(dot(w, x) + b)`` as a pure JVM
    expression).

    Same distributed shape as similarity.kmeans_train: the MODEL
    (dim+1 doubles) is driver-side state compiled into each
    iteration's plan as literals; the DATA never leaves the
    executors. Per iteration one scan computes per-row
    ``sigmoid(w·x + b) - y`` JVM-side, one (dim) partial-agg shuffle
    sums the gradient (posexplode → sum), dim+1 values collect.
    Weights update ``w -= lr/n * g`` and round to ``weight_dp``
    (heals partition-order float drift — the cross-engine determinism
    contract the oracle gate relies on). Labels must be 0/1 (cast
    yourself); vectors must be same-length.

    Returns ``(weights, bias)`` as plain python values — model state,
    not a DataFrame; call ``logreg_score`` for corpus predictions.

    At 100 TB: iters × (one scan + one narrow shuffle), identical
    cost shape to an aggregation sweep."""
    if iters < 1:
        raise ValueError("logreg_train: iters must be >= 1")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = (df.select(vec_d.alias("_x"),
                      F.col(label_col).cast("double").alias("_y"))
            .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull()))
    first = base.select(F.size("_x").alias("d")).first()
    if first is None:
        raise ValueError("logreg_train: empty input")
    dim = first["d"]
    n = base.count()
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        # the whole sigmoid(w.x + b) - y tree as ONE SQL string per
        # iteration (one Py4J call): per-element literal chatter plus
        # per-lambda registration is pure driver latency (the kmeans
        # _assign finding); the SQL lambda form compiles to the
        # identical HigherOrderFunction plan and repr(float)
        # round-trips every weight bit-exactly
        resid = F.expr(
            "CAST(1.0 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+exp(-("
            "aggregate(zip_with(_x,array("
            + ",".join(repr(float(x)) + "D" for x in w)
            + "),(a,c)->a*c)," + repr(float(b)) + "D,"
            "(acc,v)->acc+v)))) - _y")
        scored = base.withColumn("_r", resid)
        grad = (scored.select(F.posexplode("_x").alias("d", "xv"), "_r")
                .groupBy("d")
                .agg(F.sum(F.col("xv") * F.col("_r")).alias("g"))
                .collect())
        gb = scored.select(F.sum("_r").alias("g")).first()["g"]
        gmap = {r["d"]: float(r["g"]) for r in grad}
        w = [round(w[d] - lr * gmap.get(d, 0.0) / n, weight_dp)
             for d in range(dim)]
        b = round(b - lr * float(gb) / n, weight_dp)
    return w, b


def logreg_score(df: DataFrame, weights: list, bias: float,
                 vec_col: str = "embedding",
                 out_col: str = "prob") -> DataFrame:
    """sigmoid(w·x + b) per row as a JVM expression — map-only corpus
    scoring with the trained model."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    wlit = lit_double_array(weights)
    s = F.aggregate(F.zip_with(vec_d, wlit, lambda a, c: a * c),
                    F.lit(float(bias)), lambda acc, v: acc + v)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-s)))
