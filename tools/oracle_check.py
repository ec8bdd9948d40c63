"""Local replica of the driver's correctness gate.

Runs every gate query (__spark_entry__.queries()) AND every non-gate extra
query (queries.EXTRA_QUERIES) against its DuckDB oracle at a given sf and
reports row-count / schema / value-hash agreement, so mismatches are caught
before the driver's per-round verify.

Two hash modes, both always run:

- fetchall mode (the original): canonicalizes Python values from
  `.collect()` / `.fetchall()` — ints stay ints regardless of DuckDB's
  internal width.
- pandas mode (the driver's): materializes BOTH sides as pandas DataFrames,
  sorts by all columns, and canonicalizes per-dtype.  This reproduces the
  driver's failure classes that fetchall mode cannot see: DuckDB HUGEINT
  results degrade to float64 in pandas (r02 `user_sessions`), and list
  cells make pandas sort_values raise `unhashable type: 'list'`
  (r02 `user_event_sequence`).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
       python tools/oracle_check.py [sf_dir] --json ARTIFACT.json

--json writes a machine-readable per-query record (rows / schema / hash /
pandas-hash agreement, wall seconds, error) for every query checked —
the committed EXTRAS_ORACLE_r{N}.json artifact that makes the "extras are
locally oracle-checked" claim auditable per round (VERDICT r9 #6).
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apache_kafka_clickhouse_demo_spark.schemas import TESTDATA_TABLES
from apache_kafka_clickhouse_demo_spark.session import get_spark
from apache_kafka_clickhouse_demo_spark import queries as Q
import __spark_entry__ as entrymod


def _canon_value(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon_rows:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def pandas_hash(pdf) -> str:
    """The driver-style canonicalization: sort columns by name, sort rows by
    all columns (this is where list cells explode, exactly like the driver),
    then hash per-dtype canonical strings — float64 and int64 canonicalize
    DIFFERENTLY, so a HUGEINT->float64 degradation flips the hash."""
    import datetime

    import numpy as np
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for _, row in pdf.iterrows():
        parts = []
        for v in row:
            if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
                parts.append("NULL")
            elif isinstance(v, (np.floating, float)):
                parts.append(repr(float(v)))
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                parts.append(str(int(v)))
            elif isinstance(v, pd.Timestamp):
                v2 = v.tz_localize(None) if v.tzinfo else v
                # DATE columns surface as date objects (Spark) vs midnight
                # datetime64 (DuckDB .df()) — canonicalize both to the date
                parts.append(
                    v2.date().isoformat() if v2 == v2.normalize() else v2.isoformat()
                )
            elif isinstance(v, datetime.datetime):
                vv = v.replace(tzinfo=None)
                parts.append(
                    vv.date().isoformat()
                    if vv.time() == datetime.time() else vv.isoformat()
                )
            elif isinstance(v, datetime.date):
                parts.append(v.isoformat())
            else:
                parts.append(str(v))
        h.update("|".join(parts).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--vanilla"]
    vanilla = "--vanilla" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    records: dict[str, dict] = {}

    if vanilla:
        # the external driver's environment: a bare SparkSession with NONE
        # of session.py's configs — catches any conf the library forgot to
        # set at runtime (e.g. the nanos-timestamp legacy flag)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("oracle-check-vanilla").getOrCreate()
    else:
        spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    extras = dict(Q.EXTRA_QUERIES)
    queries.update({f"extra:{k}": entrymod._fresh_cache(v) for k, v in extras.items()})
    oracles.update({f"extra:{k}": v for k, v in Q.extra_oracles().items()})

    failures = []
    for name, fn in queries.items():
        if only and name not in only and name.removeprefix("extra:") not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            records[name] = {"err": f"spark: {e}"}
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            records[name] = {
                "rows": len(srows), "oracle": None, "sec": round(spark_s, 2),
                "err": None,
            }
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            records[name] = {"err": f"duckdb: {e}"}
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
        ok_hash = sh == dh
        # driver-style pandas canonicalization (reproduces HUGEINT/list bugs)
        try:
            sph, dph = pandas_hash(spdf), pandas_hash(dpdf)
            ok_pd = sph == dph
            pd_msg = "=" if ok_pd else f"{sph}!={dph}"
        except Exception as e:  # noqa: BLE001 — the list-cell class
            ok_pd = False
            pd_msg = f"canon-error: {type(e).__name__}: {e}"
        status = "OK  " if (ok_count and ok_cols and ok_hash and ok_pd) else "FAIL"
        records[name] = {
            "rows_spark": len(srows),
            "rows_oracle": len(drows),
            "rows_match": ok_count,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "pandas_match": ok_pd,
            "sec": round(spark_s, 2),
            "err": None,
        }
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} cols={'=' if ok_cols else 'DIFF'} "
            f"hash={'=' if ok_hash else f'{sh}!={dh}'} pd={pd_msg} [{spark_s:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {scols}\n      duck  cols: {dcols}")
            if ok_cols and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(_canon_value(r[i]) for i in order) for r in srows}
                dset = {tuple(_canon_value(r[i]) for i in order) for r in drows}
                for label, diff in (("spark-only", sset - dset), ("duck-only", dset - sset)):
                    for row in list(diff)[:3]:
                        print(f"      {label}: {row}")
            if ok_cols and ok_hash and not ok_pd:
                print(f"      spark dtypes: {dict(spdf.dtypes.astype(str))}")
                print(f"      duck  dtypes: {dict(dpdf.dtypes.astype(str))}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json

        gate = {k: v for k, v in records.items() if not k.startswith("extra:")}
        extra = {
            k.removeprefix("extra:"): v
            for k, v in records.items()
            if k.startswith("extra:")
        }
        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "vanilla": vanilla,
                    "n_gate": len(gate),
                    "n_extra": len(extra),
                    "n_failures": len(failures),
                    "failures": failures,
                    "gate": gate,
                    "extras": extra,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
