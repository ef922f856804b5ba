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
    sort rows.

    Mirrors the driver's pandas-based canonicalizer in one crucial way: the
    driver sorts a pandas DataFrame by every column, which raises
    `unhashable type` on list/dict values — so we hard-fail on non-scalar
    cells here too, to catch it locally before the driver does.
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
                # list/dict/tuple/np.ndarray cells — the driver's pandas
                # canonicalizer cannot hash these
                raise TypeError(
                    f"non-scalar value in result column '{cols[i]}' "
                    f"({type(v).__name__}) — the driver's canonicalizer "
                    "cannot hash this; stringify with array_join/to_json"
                )
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6g}"
            elif hasattr(v, "hour") and hasattr(v, "date"):
                # datetime-like: one engine yields datetime.date, the other
                # datetime64 at midnight — print midnight stamps as dates
                if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
                    v = str(v.date())
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from embeddingsearch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(
        "compare-oracle",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # same rationale as bench.py: the provably-bounded single-partition
    # windows emit a benign WindowExec warning per execution that buries
    # real signal in sweep logs — errors still surface
    spark.sparkContext.setLogLevel("ERROR")
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
        # materialize BOTH sides through pandas, exactly like the driver —
        # this surfaces dtype drift (e.g. DuckDB HUGEINT → float64/object)
        # that raw fetchall() hides
        spdf = sdf.toPandas()
        scols = list(spdf.columns)
        srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        if name not in oracles:
            # the driver canonicalizes rows-only results too — make sure
            # they'd survive its pandas canon (no list/dict cells)
            canon(srows, scols)
            print(f"{name:28s} rows={len(srows):6d}  (no oracle — rows-only)")
            continue
        opdf = con.execute(oracles[name]).df()
        ocols = list(opdf.columns)
        orows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]
        ok_cols = sorted(scols) == sorted(ocols)
        # NUMERIC dtype-kind drift (int vs float vs object) makes the
        # driver's value-hash differ even when printed values match — e.g.
        # DuckDB sum(BIGINT) → HUGEINT → float64/object. Catch it here.
        # (object-vs-datetime64 for DATE columns is benign: the driver
        # passed such queries in round 1.)
        dtype_drift = [
            c
            for c in scols
            if c in ocols
            and spdf[c].dtype.kind != opdf[c].dtype.kind
            and ("iuf".find(spdf[c].dtype.kind) >= 0
                 or "iuf".find(opdf[c].dtype.kind) >= 0)
        ]
        if dtype_drift:
            drift = {
                c: f"{spdf[c].dtype} vs {opdf[c].dtype}" for c in dtype_drift
            }
            print(f"{name:28s} FAIL dtype drift: {drift}")
            failures.append(name)
            continue
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
