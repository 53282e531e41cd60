"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, then compares row count, column-name
set, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding).

Driver fidelity (round 4): the driver materializes DuckDB results
through a dataframe path that widens an output column's TYPE before
hashing, so a type asymmetry between the Spark result and the oracle
result (DuckDB HUGEINT/DECIMAL vs Spark BIGINT — the uncast ``SUM()``
/ ``ROUND()`` class; or DOUBLE vs BIGINT generally) diverges the value
hash even when every value agrees numerically ("1.0" vs "1").  Round 3
shipped three oracles the value comparator passed and the driver
failed for exactly this reason.  The value comparator below is the
round-3-proven one (it reproduced all 46 driver passes); the new
TYPE LINT closes the gap structurally: every oracle is ``DESCRIBE``d
and each output column's type class (int/float/str/bool/date/ts/...)
must match the Spark result schema's class, with HUGEINT/DECIMAL
banned outright.  A type-class mismatch is a FAIL even if values
stringify identically — that is precisely the case the driver hashes
differently.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --perturb [sf_dir] [query ...]

--perturb is the DETERMINISM gate (r11 VERDICT lead #2): each Spark
query runs twice with every catalog scan re-sharded two different ways
(SPARK_GRAFT_PERTURB=7 vs 13 — see catalog.load_table), permuting the
partial-aggregation accumulation order, and the two runs' value hashes
must agree.  A mismatch is the r11 ``tpch_q11`` failure class — a
``ROUND(SUM(double), 2)`` whose true sum sits exactly on the rounding
grid, flipping a cent with accumulation order — surfacing as a driver
value-hash flake even though the local DuckDB gate passes.  No DuckDB
run in this mode; it is Spark-vs-Spark.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

_argv = [a for a in sys.argv[1:] if a != "--perturb"]
PERTURB = "--perturb" in sys.argv[1:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])


def _tclass_spark(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("tinyint", "smallint", "int", "bigint", "long", "short", "byte"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t == "binary":
        return "bytes"
    if t.startswith("array"):
        return "list"
    return "other"


def _tclass_duck(t: str) -> str:
    t = t.upper()
    if t.endswith("]"):
        return "list"
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BLOB":
        return "bytes"
    return "other"


def type_lint(spark_dtypes: dict[str, str], duck_desc) -> list[str]:
    """Column-level type-class mismatches between the Spark result and
    the DESCRIBEd oracle — each one is a driver hash divergence even
    when values agree ('1.0' vs '1').  DECIMAL/HUGEINT on the DuckDB
    side is banned outright: the driver widens it to float while Spark
    ships an integer, the exact round-1/round-3 failure class."""
    problems = []
    duck_types = {c: t for c, t, *_ in duck_desc}
    for col, dt in duck_types.items():
        dcls = _tclass_duck(dt)
        if dcls == "decimal":
            problems.append(
                f"oracle column {col!r} is {dt} — driver widens to "
                f"float; CAST to BIGINT/DOUBLE in the oracle SQL")
            continue
        if col not in spark_dtypes:
            continue  # column-name mismatch is reported separately
        scls = _tclass_spark(spark_dtypes[col])
        if dcls != scls and "other" not in (dcls, scls):
            problems.append(
                f"type-class mismatch on {col!r}: spark "
                f"{spark_dtypes[col]} ({scls}) vs oracle {dt} ({dcls})")
    return problems


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def perturb_main():
    """Spark-vs-Spark determinism gate: every query under two catalog
    re-shardings must produce identical (rowcount, value hash)."""
    from nosql_join_stream_spark.session import get_session
    import __spark_entry__ as entry_mod

    spark = get_session()
    qs = entry_mod.queries()
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        runs = []
        try:
            for n in ("7", "13"):
                os.environ["SPARK_GRAFT_PERTURB"] = n
                try:
                    sdf = fn(spark, SF_DIR)
                    rows = [tuple(r) for r in sdf.collect()]
                    runs.append((len(rows), value_hash(sdf.columns, rows)))
                finally:
                    os.environ.pop("SPARK_GRAFT_PERTURB", None)
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if runs[0] != runs[1]:
            print(f"FAIL {name}: NONDETERMINISTIC under re-sharding "
                  f"(rows {runs[0][0]} vs {runs[1][0]}, "
                  f"hash {'==' if runs[0][1] == runs[1][1] else '!='})")
            failed.append(name)
        else:
            print(f"OK   {name}: {runs[0][0]} rows, hash stable")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


def main():
    if PERTURB:
        return perturb_main()
    from nosql_join_stream_spark.session import get_session
    import __spark_entry__ as entry_mod

    spark = get_session()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            lint = type_lint(dict(sdf.dtypes), desc)
            if lint:
                print(f"FAIL {name}: LINT {'; '.join(lint)}")
                failed.append(name)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
            if sh != dh:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {"|".join(canon(r[i]) for i in order_s) for r in srows}
                dset = {"|".join(canon(r[i]) for i in order_d) for r in drows}
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                problems.append(
                    f"value-hash mismatch; spark-only={only_s} duck-only={only_d}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
