"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet views), then compares
row count, schema (column names), and an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalised).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import sys
from datetime import datetime

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; both engines hand back
        # IEEE doubles so identical bits → identical repr
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from fileverification_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:30s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} ORACLE ERROR: {e}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh = value_hash(scols, srows)
        oh = value_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        print(
            f"{name:30s} {status}  rows {len(srows)}/{len(orows)}"
            f" schema={'=' if ok_schema else 'DIFF'} hash={'=' if ok_hash else 'DIFF'}"
        )
        if status != "OK":
            failures += 1
            if not ok_schema:
                print(f"   spark cols: {sorted(scols)}")
                print(f"   oracle cols: {sorted(ocols)}")
            if ok_schema and not ok_hash:
                # show first differing canonical line
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"   spark : {a[:200]}")
                        print(f"   oracle: {b[:200]}")
                        break
                if len(ls) != len(lo):
                    print(f"   row counts differ: {len(ls)} vs {len(lo)}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
