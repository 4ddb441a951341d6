"""Driver-gate rehearsal: run every __spark_entry__ query against its DuckDB
oracle at a given scale factor and compare row count, schema (column names),
and values (columns sorted by name, rows sorted) — a strict local stand-in
for the driver's CORRECTNESS_r{N}.json check.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # BIT-exact, signbit included (repr distinguishes -0.0): the
                # driver hashes raw values, so any rounding/-0.0 masking here
                # makes this rehearsal weaker than the real gate — round 2's
                # only red row (ann_lsh_multiprobe, a -0.0 from DuckDB round)
                # passed this checker precisely because of such masking.
                v = repr(v)
            # Type-sensitive like the driver's value hash: a DuckDB HUGEINT
            # (arrow decimal -> Decimal) must NOT silently equal a Spark bigint.
            vals.append((type(r[i]).__name__, v if isinstance(r[i], float) else str(v)))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x[1] is None, str(x[1])) for x in t))
    return [cols[i] for i in order], out


def compare(name: str, spark_df, sql: str, con) -> list[str]:
    problems: list[str] = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    try:
        dres = con.sql(sql)
        dcols = list(dres.columns)
        # Fetch via Arrow so DuckDB HUGEINT surfaces as Decimal (type-visible),
        # matching how the driver's type-sensitive value hash sees it.
        tbl = dres.arrow()
        dcolumns = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        drows = list(zip(*dcolumns)) if dcolumns else []
    except Exception as e:  # noqa: BLE001
        return [f"{name}: ORACLE SQL ERROR: {e}"]
    if sorted(scols) != sorted(dcols):
        problems.append(f"{name}: schema mismatch spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"{name}: rowcount spark={len(srows)} duck={len(drows)}")
    _, sn = normalize(srows, scols)
    _, dn = normalize(drows, dcols)
    if sn != dn:
        bad = 0
        for a, b in zip(sn, dn):
            if a != b:
                if bad < 3:
                    problems.append(f"{name}: VALUE diff\n  spark={a}\n  duck ={b}")
                bad += 1
        if bad:
            problems.append(f"{name}: {bad} differing rows (of {len(sn)})")
        elif len(sn) != len(dn):
            pass
        else:
            problems.append(f"{name}: rows differ in ways zip hides")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bravewebcrawler_spark.session import get_spark

    spark = get_spark("check-queries", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  {name}: rows-only check, {n} rows")
            continue
        try:
            df = fn(spark, sf_dir)
            probs = compare(name, df, oracles[name], con)
        except Exception as e:  # noqa: BLE001
            probs = [f"{name}: SPARK ERROR: {type(e).__name__}: {str(e)[:500]}"]
        if probs:
            failures += 1
            print(f"FAIL {name}")
            for p in probs:
                print("   ", p)
        else:
            print(f"  ok {name}")
    print(f"done: {checked - failures}/{checked} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
