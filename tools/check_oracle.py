"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` on the same sf dir, compare
row count, column-name set, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --exact [sf_dir] [query ...]
       python tools/check_oracle.py --exact --prefix 50 [sf_dir]
         (pre-run the driver's gate slice: first N registry entries)

``--exact`` compares floats bit-for-bit (no 9-dp rounding tolerance) —
the driver hashes exact typed values, so this is the honest local
stand-in; the default tolerance exists only for quick triage of WHERE
a mismatch comes from.  As of round 3 all queries pass --exact.
"""

from __future__ import annotations

import datetime
import math
import sys
from decimal import Decimal

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


EXACT = False


def norm_val(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v if EXACT else round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def type_bucket(t: str) -> str:
    """Coarse type classes for the Spark-vs-DuckDB result audit."""
    t = t.lower()
    if "hugeint" in t:
        return "HUGEINT"
    if t.startswith("decimal"):
        return "decimal"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "uinteger", "ubigint", "usmallint", "utinyint"):
        return "int" if not t.startswith("u") else "uint"
    if t in ("float", "double", "real", "double precision"):
        return "float"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("string", "varchar", "text"):
        return "str"
    return t


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    global EXACT
    args = sys.argv[1:]
    if args and args[0] == "--exact":
        EXACT = True
        args = args[1:]
    prefix_n = 0
    if args and args[0] == "--prefix":
        # pre-run exactly the driver's gate slice: the first N entries
        # of queries() in registry order (the driver samples a ~50-entry
        # prefix each round)
        prefix_n = int(args[1])
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if prefix_n:
        only = set(list(entrymod.queries())[:prefix_n]) | only
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
            dtypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            # type-class audit: the driver hashes TYPED values, so a
            # value-equal result can still hash-red when DuckDB widens a
            # type Spark does not (sum(BIGINT) -> HUGEINT was the round-2
            # domain_mix_sample failure; regr_count -> UINTEGER etc.)
            tmism = [
                f"{c}: spark {stypes[c]} vs duck {dtypes.get(c)}"
                for c in scols
                if c in dtypes and type_bucket(stypes[c]) != type_bucket(dtypes[c])
            ]
            if tmism:
                ok = False
                msgs.append("type-class mismatch (driver hash risk): " + "; ".join(tmism))
        if ok:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            mismatch = [
                (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
            ]
            if mismatch:
                ok = False
                i, a, b = mismatch[0]
                msgs.append(
                    f"{len(mismatch)} value mismatches; first @{i}:\n  spark={a}\n  duck ={b}"
                )
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name}: rows={len(srows)} ({time.time()-t0:.1f}s)" + ("" if ok else " " + "; ".join(msgs)))
        if not ok:
            failures.append(name)
    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
