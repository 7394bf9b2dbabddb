"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB, compare row count + order-
insensitive values (columns sorted by name). Usage:

    python tools/compare_oracle.py [--strict] [sf_dir] [query ...]

``--strict`` skips the forgiving canonicalization (6dp floats, µs
timestamps) and compares pandas-converted values at full precision —
round 1 proved the driver's hasher is stricter than the default mode
(CORRECTNESS_r01 failed 5 queries this tool passed: DuckDB HUGEINT→
float64 sums, decimal-vs-double division, pandas-overflowing sentinel
timestamps). A query is only "done" when it passes --strict.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session


def norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") if v == v else "nan"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, list):
        return "[" + ",".join(str(norm(x)) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def strict_norm(v):
    """Full-precision stringification — no float rounding, no timestamp
    truncation; dtype differences (int64 5 vs float64 5.0, Decimal vs
    float) surface as mismatches, like the driver's hasher."""
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        seq = v.tolist() if hasattr(v, "tolist") else v
        if isinstance(seq, list):
            return "[" + ",".join(strict_norm(x) for x in seq) + "]"
        v = seq
    return repr(v)


def strict_canon(pdf):
    pdf = pdf[sorted(pdf.columns, key=str.lower)]
    rows = [tuple(strict_norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    args = sys.argv[1:]
    strict = "--strict" in args
    if strict:
        args.remove("--strict")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    # parallelism is env-tunable so the suite can be shaken under
    # different partitionings — double-sum accumulation order changes
    # with partition count, and a hash that only matches at one
    # parallelism is not robust
    cpus = int(os.environ.get("ORACLE_COMPARE_CPUS", "8"))
    spark = get_session(
        app_name="oracle-compare", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            if strict:
                # Precondition (round-2 red embedding_resize): the driver's
                # pandas canonicalizer crashes on list-typed cells, so NO
                # entry query may emit an array/map/struct column —
                # serialize complex values to strings or explode to rows.
                from pyspark.sql.types import ArrayType, MapType, StructType

                complex_cols = [
                    f.name
                    for f in sdf.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))
                ]
                if complex_cols:
                    failures.append(name)
                    print(
                        f"FAIL {name}: complex-typed output columns "
                        f"{complex_cols} — driver canon cannot hash these; "
                        "serialize to string or explode to rows"
                    )
                    continue
            srows = sdf.toPandas() if strict else sdf.collect()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            if strict:
                opdf = res.df()
                ocols = list(opdf.columns)
            else:
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: DUCKDB ERROR {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            continue
        if strict:
            sc = strict_canon(srows)
            oc = strict_canon(opdf)
        else:
            sc = canon(srows, [c.lower() for c in scols])
            oc = canon(orows, [c.lower() for c in ocols])
        if len(sc) != len(oc):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sc)} duck={len(oc)}")
            continue
        if sc != oc:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
            continue
        print(f"PASS {name} ({len(sc)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{'='*60}\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
