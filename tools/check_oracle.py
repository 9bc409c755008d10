"""Local emulation of the driver's correctness gate: run every
queries()[name] on Spark and the matching oracle_sql()[name] on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive stringified values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> tuple[int, list[str], list[tuple]]:
    import math

    cols = sorted(df.columns)
    # replicate the driver's canonicalizer strictness: it pandas-
    # sort_values the frame, which raises TypeError on nested values
    # (array/map columns). Run the same sort here so any query emitting
    # a non-scalar column fails locally before it reaches the driver.
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        out = []
        for v in rec:
            if isinstance(v, float):
                out.append("nan" if math.isnan(v) else repr(round(v, 9)))
            else:
                out.append(str(v))
        rows.append(tuple(out))
    return len(rows), cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kgspark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error: {exc}")
            continue
        sn, sc, sr = canon(sdf)
        on, oc, orr = canon(odf)
        if sc != oc:
            failures.append(name)
            print(f"[FAIL] {name}: columns differ spark={sc} duckdb={oc}")
            continue
        if sn != on:
            failures.append(name)
            print(f"[FAIL] {name}: row count spark={sn} duckdb={on}")
            continue
        if sr != orr:
            failures.append(name)
            diff = [
                (a, b) for a, b in zip(sr, orr) if a != b
            ][:5]
            print(f"[FAIL] {name}: values differ; first diffs: {diff}")
            continue
        print(f"[OK]   {name}: {sn} rows match")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
