"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark at sf0.01 and compare against oracle_sql() via DuckDB —
row count, sorted column names, order-insensitive value multiset."""

import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from gstored_spark.session import get_spark

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    include_extra = "--all" in args
    only = [a for a in args if a != "--all"] or None
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if hasattr(entry_mod, "extra_queries") and (include_extra or only):
        # --all appends the retired variants; an explicit name may also
        # live in the retired set
        qs = {**qs, **entry_mod.extra_queries()}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF)
            cols = df.columns
            rows = [[r[c] for c in cols] for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows, cols={sorted(cols)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok = True
        if sorted(cols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: schema {sorted(cols)} != {sorted(ocols)}")
        elif len(rows) != len(orows):
            ok = False
            print(f"FAIL  {name}: rowcount {len(rows)} != {len(orows)}")
        else:
            a = to_multiset(rows, cols)
            b = to_multiset(orows, ocols)
            if a != b:
                ok = False
                diff_a = list((a - b).items())[:3]
                diff_b = list((b - a).items())[:3]
                print(f"FAIL  {name}: values differ; spark-only={diff_a} oracle-only={diff_b}")
        if ok:
            print(f"OK    {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("\n==>", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
