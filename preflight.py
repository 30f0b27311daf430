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


def _canon(v):
    """Type-strict canonical form of a result cell.

    The driver's value hash is type-sensitive (``1`` and ``1.0`` hash
    differently), so plain Python ``==`` is too lax: it let the
    round-4 ``repetition_stats`` HUGEINT->float64 oracle drift through
    preflight while the driver flagged it. Canonicalize each cell to a
    (type-tag, value) tuple so int/float/bool/decimal drift fails HERE.
    NULL-likes (None / NaN / NaT / pd.NA) all map to one null tag —
    Spark collect() yields None where DuckDB's pandas frame yields NaN
    for the same SQL NULL, and NaN != NaN under ``==`` would false-fail.
    """
    import datetime
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NA or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("null",) if math.isnan(f) else ("f", f)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, np.ndarray):
        return ("l", tuple(_canon(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    return ("o", repr(v))


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
            got = sorted(
                tuple(_canon(r[c]) for c in cols) for r in df.collect()
            )
            if name in oracles:
                wdf = con.sql(oracles[name]).df()
                wcols = sorted(wdf.columns)
                want = sorted(
                    tuple(_canon(v) for v in r)
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
