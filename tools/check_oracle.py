"""Mirror of the driver's correctness gate: run each Spark query and its
DuckDB oracle side-by-side, compare row count + column names + sorted
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from accelerator_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if v == v else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    if isinstance(v, int):
        return str(v)
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, data


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    # go through the driver's actual artifact, not the library module —
    # catches wiring drift between queries.py and __spark_entry__
    import __spark_entry__ as entrymod
    QUERIES = entrymod.queries()
    ORACLES = entrymod.oracle_sql()

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    todo = names or list(QUERIES)
    failures = []
    for name in todo:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            cur = con.execute(ORACLES[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        sc, sd = frame_sig(s_cols, s_rows)
        oc, od = frame_sig(o_cols, o_rows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duckdb={oc}")
            continue
        if len(sd) != len(od):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sd)} duckdb={len(od)}")
            continue
        if sd != od:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sd, od) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({sum(1 for a, b in zip(sd, od) if a != b)}/{len(sd)} rows); first: {diffs}")
            continue
        print(f"OK   {name}: {len(sd)} rows")
    print(f"\n{len(todo) - len(failures)}/{len(todo)} matched")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
