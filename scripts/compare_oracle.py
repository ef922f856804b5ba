"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() twin side-by-side,
compare row count, column names, and order-insensitive rounded values.

Usage: python scripts/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round floats,
    sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from embeddingsearch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("compare-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d}  (no oracle — rows-only)")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        sc, oc = canon(srows, scols), canon(orows, ocols)
        ok_vals = sc == oc
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'match' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
        )
        if not ok_vals:
            failures.append(name)
            diff_s = [x for x in sc if x not in set(oc)][:3]
            diff_o = [x for x in oc if x not in set(sc)][:3]
            print(f"   spark-only: {diff_s}")
            print(f"   oracle-only: {diff_o}")
    spark.stop()
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
