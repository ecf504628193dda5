"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a scale factor and compares with the
DuckDB oracle: row count, schema (column names, sorted), and an
order-insensitive value hash (columns sorted by name, rows sorted,
values normalized). Exit code 1 if anything mismatches.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from pg_archiver_spark.catalog import TABLES
from pg_archiver_spark.session import get_spark


def _norm(v):
    """Normalize a cell so Spark and DuckDB hash identically."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, tuple, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = tuple(cols[i] for i in order)
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\x1e".join(lines).encode()).hexdigest()[:16]
    return len(rows), names, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or list(queries)

    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            status = "ok(rows-only)" if len(srows) >= 0 else "FAIL"
            print(f"{status:>14} {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sn, sschema, shash = frame_fingerprint(scols, srows)
        on, oschema, ohash = frame_fingerprint(ocols, orows)
        if (sn, sschema, shash) == (on, oschema, ohash):
            print(f"{'ok':>14} {name}: rows={sn} hash={shash} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL {name}:")
            print(f"  spark : rows={sn} schema={sschema} hash={shash}")
            print(f"  duckdb: rows={on} schema={oschema} hash={ohash}")
            if sschema == oschema and sn == on:
                s_set = set("\x1f".join(map(_norm, r)) for r in srows)
                o_set = set("\x1f".join(map(_norm, r)) for r in orows)
                for d in list(s_set - o_set)[:3]:
                    print(f"  spark-only : {d!r}")
                for d in list(o_set - s_set)[:3]:
                    print(f"  duckdb-only: {d!r}")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
