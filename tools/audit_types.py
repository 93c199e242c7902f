"""Audit Spark vs DuckDB result-column TYPES for every oracle query.

The driver's correctness gate hashes typed values; a value-equal result
can still hash-red when DuckDB widens a type Spark does not (the
round-2 ``domain_mix_sample`` failure: ``sum(BIGINT)`` -> HUGEINT vs
Spark BIGINT).  This audit runs only schemas (LIMIT 0 on the oracle,
``.schema`` on the Spark plan) and flags per-column type-class
mismatches so they can be fixed before a query first enters the gate.

Usage: python tools/audit_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)

# single source of truth for the table registry and the type-class
# buckets (the gate checker runs the same audit inline per query)
from tools.check_oracle import TABLES, type_bucket as bucket  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = dict(sdf.dtypes)
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
            dtypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad.append(name)
            continue
        mism = []
        for c, st in stypes.items():
            dt = dtypes.get(c)
            if dt is None:
                mism.append(f"{c}: missing in oracle")
                continue
            sb, db = bucket(st), bucket(dt)
            if sb != db:
                mism.append(f"{c}: spark {st} vs duck {dt}")
        for c in dtypes:
            if c not in stypes:
                mism.append(f"{c}: missing in spark")
        if mism:
            print(f"MISM {name}: " + "; ".join(mism))
            bad.append(name)
    print(f"\n{len(bad)} queries flagged" if bad else "\nALL TYPES MATCH")


if __name__ == "__main__":
    main()
