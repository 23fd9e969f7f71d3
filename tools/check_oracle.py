"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive multiset of canonicalized rows.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from vectolite_spark.schema import TESTDATA_TABLES  # noqa: E402
from vectolite_spark.session import get_spark  # noqa: E402


# The DRIVER's correctness gate hashes EXACT value reprs — it does NOT
# round and it DOES see the IEEE sign bit (r5's only red row was a cell
# that was 0.0 in Spark and -0.0 in DuckDB; the old 9dp-rounded,
# zero-normalizing canon here passed it locally). Default is therefore
# exact repr. Set ORACLE_ROUND_DP=9 to restore the lenient comparator
# when debugging whether a mismatch is a real semantic bug or a
# last-ulp/sign-bit artifact.
_ROUND_DP = int(os.environ.get("ORACLE_ROUND_DP", "0") or 0)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if _ROUND_DP:
            if v == 0.0:
                return "0"  # lenient mode: normalize -0.0
            return repr(round(v, _ROUND_DP))
        return repr(v)  # exact: repr(-0.0) == '-0.0' != '0.0'
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


_TYPE_CANON = {
    "bigint": "i64", "long": "i64",
    "int": "i32", "integer": "i32",
    "smallint": "i16", "tinyint": "i8",
    "hugeint": "i128",
    "double": "f64", "float": "f32", "real": "f32",
    "string": "str", "varchar": "str",
    "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}


def _canon_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith(("array", "list")) or t.endswith("[]"):
        return "list"
    if t.startswith("decimal"):
        return "dec"
    return _TYPE_CANON.get(t, t)


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("oracle-check")
    # bound the build-if-absent index cache before the sweep mass-builds
    # into it (VERDICT r9 item 7) — same setup bench.py does
    from vectolite_spark.registry import vacuum_index_cache

    evicted = vacuum_index_cache()
    if evicted:
        print(f"index-cache vacuum evicted {len(evicted)} entries")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    from vectolite_spark.operators.dedup import clear_managed_caches

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # per-query cache isolation (same rationale as bench.py): one
        # operator's lingering caches must not slow or starve the next
        clear_managed_caches()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            from vectolite_spark.registry import RANGE_ORACLES

            spec = RANGE_ORACLES.get(name)
            if spec is None:
                print(
                    f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)"
                )
                continue
            # bounded-error oracle: join on key, exact cols equal, approx
            # cols within the declared relative band
            try:
                rel = con.sql(spec["sql"])
                dcols = [c.lower() for c in rel.columns]
                dmap = {
                    tuple(canon(r[dcols.index(k)]) for k in spec["key"]): r
                    for r in rel.fetchall()
                }
                scols_l = [c.lower() for c in scols]
                problems = []
                if len(srows) != len(dmap):
                    problems.append(f"rowcount spark={len(srows)} duck={len(dmap)}")
                for r in srows:
                    kt = tuple(
                        canon(r[scols_l.index(k)]) for k in spec["key"]
                    )
                    d = dmap.get(kt)
                    if d is None:
                        problems.append(f"key {kt} missing in oracle")
                        continue
                    for c in spec.get("exact", []):
                        sv, dv = r[scols_l.index(c)], d[dcols.index(c)]
                        if canon(sv) != canon(dv):
                            problems.append(f"{kt}.{c}: exact {sv} != {dv}")
                    for c, tol in spec.get("rel_tol", {}).items():
                        sv, dv = float(r[scols_l.index(c)]), float(d[dcols.index(c)])
                        if dv != 0 and abs(sv - dv) / abs(dv) > tol:
                            problems.append(
                                f"{kt}.{c}: {sv} outside +/-{tol:.0%} of {dv}"
                            )
                    for c, tol in spec.get("abs_tol", {}).items():
                        sv, dv = float(r[scols_l.index(c)]), float(d[dcols.index(c)])
                        if abs(sv - dv) > tol:
                            problems.append(
                                f"{kt}.{c}: {sv} outside +/-{tol} of {dv}"
                            )
                if problems:
                    print(f"FAIL  {name} (range-oracle): {'; '.join(problems[:4])}")
                    failures.append(name)
                else:
                    print(
                        f"OK~   {name}: {len(srows)} rows within declared error "
                        f"band  ({time.time()-t0:.1f}s)"
                    )
            except Exception as e:
                print(f"FAIL  {name}: range-oracle error: {e}")
                failures.append(name)
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if sorted(scols_l) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols_l)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        # Schema-type probe: the DRIVER's value hash is type-sensitive (the
        # r2 profile_documents red row was Spark INT vs DuckDB BIGINT/
        # HUGEINT — invisible both to the str() canonicalization below and
        # to Python's unified int). Map both engines' declared types to a
        # canonical width and warn on mismatch so aggregates get
        # cast-aligned on both sides.
        ducktypes = {c.lower(): str(t).lower() for c, t in zip(rel.columns, rel.types)}
        for c, st in ((c.lower(), t) for c, t in sdf.dtypes):
            dtn = ducktypes.get(c, "")
            if _canon_type(st) != _canon_type(dtn):
                print(f"WARN  {name}.{c}: spark type={st} duck type={dtn}")
        if not problems:
            sm = rows_multiset(scols_l, srows)
            dm = rows_multiset(dcols, drows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
