"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, sorted column names, and an order-insensitive
multiset of row values. Exit code 1 on any mismatch.

Usage:  python tools/check_oracle.py [query ...]
        CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_oracle.py
        python tools/check_oracle.py --vanilla [query ...]

``--vanilla`` runs against a deliberately hostile SparkSession (default
confs, America/New_York session timezone, 8 cores) instead of the
engine's tuned session — replicating the driver, which builds ITS OWN
session. Every query must self-configure whatever it needs.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return str(v)


# spark simpleString -> compatible duckdb type names (lowercased)
TYPE_COMPAT = {
    "bigint": {"bigint", "hugeint", "int128"},
    "int": {"integer", "int", "int32"},
    "smallint": {"smallint"},
    "double": {"double", "float8"},
    "float": {"float", "real"},
    "string": {"varchar"},
    "boolean": {"boolean"},
    "date": {"date"},
    "timestamp": {"timestamp", "timestamp with time zone"},
    "timestamp_ntz": {"timestamp"},
}


def type_mismatches(sdf, rel) -> list:
    """Columns whose Spark type has no compatible DuckDB counterpart —
    the driver compares schemas, so int-vs-bigint style drift is a
    latent FAIL even when values hash equal."""
    dtypes = {c.lower(): str(t).lower() for c, t in zip(rel.columns, rel.types)}
    out = []
    for f in sdf.schema.fields:
        st = f.dataType.simpleString()
        dt = dtypes.get(f.name.lower())
        if dt is None:
            continue
        ok = TYPE_COMPAT.get(st)
        if ok is None:
            continue  # arrays/structs: value comparison covers them
        if dt not in ok:
            out.append((f.name, st, dt))
    return out


def frame_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from gene_level_metadata_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = {a for a in args if a != "--vanilla"}
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-vanilla")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sc, sm = frame_to_multiset(scols, srows)
        dc, dm = frame_to_multiset(dcols, drows)
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} vs {len(drows)}")
        tmix = type_mismatches(sdf, rel)
        if tmix:
            status.append(f"types {tmix}")
        if sc != dc:
            status.append(f"schema {sc} vs {dc}")
        elif sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
