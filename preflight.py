"""Pre-flight the driver contract locally: run EVERY ``queries()``
entry at sf0.01 and value-compare against its ``oracle_sql()`` through
DuckDB (column names sorted, rows sorted — the driver's comparison
shape). Rows without an oracle report their row count. Exit non-zero
on any mismatch/error.

Usage: python preflight.py [sf_dir]          (default /root/testdata/sf0.01)
"""

import importlib.util
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(here, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from yase_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")
    qs, oracles = mod.queries(), mod.oracle_sql()
    only = set(sys.argv[2:])  # optional entry-name filter
    if only:
        unknown = only - qs.keys()
        if unknown:
            print("unknown entries:", sorted(unknown))
            return 1
        qs = {n: f for n, f in qs.items() if n in only}
    bad = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            got = sorted(tuple(r[c] for c in cols) for r in df.collect())
            if name in oracles:
                wdf = con.sql(oracles[name]).df()
                wcols = sorted(wdf.columns)
                want = sorted(
                    tuple(r)
                    for r in wdf[wcols].itertuples(index=False, name=None)
                )
                ok = cols == wcols and got == want
                status = "OK" if ok else "MISMATCH"
                if not ok:
                    bad.append(name)
            else:
                status = f"rows-only({len(got)})"
            print(f"{name}: {status} [{time.time() - t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"{name}: ERROR {e}", flush=True)
    print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
