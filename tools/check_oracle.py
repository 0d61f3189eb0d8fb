"""Local stand-in for the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` on DuckDB over the
same parquet tables, compare row count + sorted column names +
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# DuckDB logical type -> Spark simple dtype. Anything unmapped (e.g.
# HUGEINT from an uncast integer sum()) deliberately fails the strict
# type compare — the driver's value hash is typed, so a HUGEINT/BIGINT
# mismatch is a red CORRECTNESS row even when the values are equal.
_DUCK_TO_SPARK = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def duck_type_to_spark(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]"):
        inner = duck_type_to_spark(t[:-2])
        return f"array<{inner}>"
    return _DUCK_TO_SPARK.get(t, f"<unmapped:{t}>")


def check_types(name, scols, sdtypes, dcols, dtypes_):
    """Strict dtype compare, by sorted column name."""
    smap = dict(sdtypes)
    dmap = {c: duck_type_to_spark(t) for c, t in zip(dcols, dtypes_)}
    bad = []
    for c in sorted(set(scols) & set(dcols)):
        st = smap[c].replace(" ", "")
        dt = dmap[c].replace(" ", "")
        if st != dt:
            bad.append(f"{c}: spark={st} duck={dt}")
    return bad


def norm_rows(cols, rows):
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
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(srows)} rows, cols={scols} "
                f"({time.time()-t0:.1f}s) [no oracle]"
            )
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            dtypes_ = res.types
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        type_bad = check_types(name, scols, sdtypes, dcols, dtypes_)
        if type_bad:
            print(f"FAIL  {name}: dtype mismatch: {'; '.join(type_bad)}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rows {len(sr)} vs {len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(
                f"FAIL  {name}: {len(bad)}/{len(sr)} row mismatches; "
                f"first: spark={bad[0][0]} duck={bad[0][1]}"
            )
            n_fail += 1
            continue
        print(
            f"PASS  {name}: {len(sr)} rows x {len(sc)} cols "
            f"({time.time()-t0:.1f}s)"
        )
        n_pass += 1

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(qs) if not only else len(only)}"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
