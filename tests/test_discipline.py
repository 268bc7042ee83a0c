"""Source-level scale-discipline guards: the rules SCALE.md promises
are enforced mechanically, so a future query can't quietly reintroduce
a driver-side materialization or a Python-UDF hot path.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY_MODULES = ("accelerator_spark/queries.py",
                 "accelerator_spark/queries2.py",
                 "accelerator_spark/queries3.py",
                 "accelerator_spark/queries4.py",
                 "accelerator_spark/queries5.py",
                 "accelerator_spark/queries6.py")

# Functions allowed to .collect(): each pulls a provably tiny,
# size-bounded result to the driver (a sketch, k centroid dims, two
# scalar counts) — documented in their docstrings.
COLLECT_WHITELIST = {
    "heavy_hitter_users",     # 2 scalar aggregates (threshold inputs)
    "cms_frequency_gate",     # one few-KiB sketch blob
    "classifier_auc_report",  # 64 centroid dimensions
}


def _functions(path):
    tree = ast.parse(open(os.path.join(REPO, path)).read())
    return [n for n in tree.body if isinstance(n, ast.FunctionDef)]


def test_no_unbounded_collect_in_query_surface():
    """Every .collect() in the query surface must be on the whitelist
    of known bounded-size driver pulls."""
    offenders = []
    for mod in QUERY_MODULES:
        for fn in _functions(mod):
            if fn.name in COLLECT_WHITELIST:
                continue
            for node in ast.walk(fn):
                if isinstance(node, ast.Attribute) and node.attr == "collect":
                    offenders.append(f"{mod}:{fn.name}")
    assert not offenders, (
        f"unreviewed .collect() in query surface: {offenders} — bounded "
        "driver pulls go on COLLECT_WHITELIST with a docstring note")


def test_no_rdd_or_topandas_in_query_surface():
    """No RDD drops or full toPandas() materializations anywhere in the
    query surface (Arrow-batched mapInPandas is fine — it is an
    executor-side exchange, not a driver pull)."""
    offenders = []
    for mod in QUERY_MODULES:
        for fn in _functions(mod):
            for node in ast.walk(fn):
                if isinstance(node, ast.Attribute) and node.attr in (
                        "toPandas",):
                    offenders.append(f"{mod}:{fn.name}:{node.attr}")
    assert not offenders


def test_no_row_at_a_time_python_udf():
    """F.udf (row-at-a-time Python) must not appear in operators or
    queries — Python escape hatches are Arrow-batched (pandas_udf,
    mapInPandas, applyInPandas, UDTF)."""
    roots = list(QUERY_MODULES) + ["accelerator_spark/operators"]
    offenders = []
    for root in roots:
        full = os.path.join(REPO, root)
        paths = ([full] if full.endswith(".py") else
                 [os.path.join(full, f) for f in os.listdir(full)
                  if f.endswith(".py")])
        for p in paths:
            src = open(p).read()
            for node in ast.walk(ast.parse(src)):
                if (isinstance(node, ast.Attribute) and node.attr == "udf"
                        and isinstance(node.value, ast.Name)
                        and node.value.id == "F"):
                    offenders.append(p)
    assert not offenders
