"""Local emulation of the driver's correctness gate: run every
queries()[name] on Spark and the matching oracle_sql()[name] on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive stringified values. Usage:

    python tools/check_oracle.py [--json out.json] [sf_dir] [query ...]

--json writes per-query results in the driver's CORRECTNESS_r{N}.json
shape (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err),
so a full-dict local run is an auditable artifact for queries outside
the driver's 50-entry verification window (see the ordering contract
in __spark_entry__.queries()).
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
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    results: dict[str, dict] = {}

    def record(name, **kw):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        row.update(kw)
        results[name] = row

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            record(name, err=f"spark: {exc}"[:300])
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            record(name, spark_rows=len(sdf), err="no_oracle")
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            record(name, spark_rows=len(sdf), err=f"duckdb: {exc}"[:300])
            print(f"[FAIL] {name}: duckdb error: {exc}")
            continue
        sn, sc, sr = canon(sdf)
        on, oc, orr = canon(odf)
        record(name, rows_match=sn == on, schema_match=sc == oc,
               hash_match=sr == orr, spark_rows=sn, oracle_rows=on)
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
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_path} ({len(results)} queries)")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
