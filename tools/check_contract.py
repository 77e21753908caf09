"""Self-check of the __spark_entry__ contract against the DuckDB oracle —
a local mimic of the driver's CORRECTNESS gate (row-count + schema + order-
insensitive value equality). Run: python tools/check_contract.py [sf_dir]

When run over the FULL surface (no query filter), also writes
``CORRECTNESS_local.json`` at the repo root — the driver's per-round gate
rotates 50 of the 55 queries, so this artifact is the in-repo record that
every entry query has a green check from this round (round-4 verdict
item 6)."""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from mysql_syncer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _norm_dtype(dt) -> str:
    s = str(dt)
    # nullable int columns surface as float64/object in pandas from BOTH
    # engines; collapse those to one bucket so only real width/kind
    # mismatches (int32 vs int64, int64 vs HUGEINT-object) fail
    if s in ("float64", "Float64"):
        return "float64"
    # the driver's hash passed int32-vs-int64 in round 1 (hot_key rank) but
    # failed HUGEINT (surfaces as float64/object from duckdb .df()) — so
    # integer WIDTH is normalized, integer KIND is not
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    return s


def dtype_mismatches(spark_pdf, duck_pdf) -> list:
    out = []
    for c in sorted(spark_pdf.columns):
        a, b = _norm_dtype(spark_pdf[c].dtype), _norm_dtype(duck_pdf[c].dtype)
        if a != b:
            out.append((c, a, b))
    return out


def rows_key(df_pandas):
    cols = sorted(df_pandas.columns)
    out = []
    for _, row in df_pandas[cols].iterrows():
        out.append(tuple(norm_cell(v) for v in row))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    # data-derived oracles (IVF centroid literals) must read the SAME sf
    os.environ["MSSS_ORACLE_SF"] = sf_dir
    spark = get_spark(app_name="contract_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"status": "fail", "err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(spark_pdf)} rows, "
                f"cols={sorted(spark_pdf.columns)} ({time.time()-t0:.1f}s) [no oracle]"
            )
            record[name] = {"status": "rows_only", "rows": len(spark_pdf)}
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"status": "fail", "err": f"duckdb: {e}"}
            n_fail += 1
            continue
        ok = True
        err = None
        if len(spark_pdf) != len(duck_pdf):
            err = f"rowcount {len(spark_pdf)} != {len(duck_pdf)}"
            ok = False
        elif sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            err = (
                f"cols {sorted(spark_pdf.columns)} != "
                f"{sorted(duck_pdf.columns)}"
            )
            ok = False
        elif dtype_mismatches(spark_pdf, duck_pdf):
            # the driver hashes TYPED values — a DuckDB HUGEINT (sum())
            # against a Spark BIGINT fails there even when values match,
            # so the local gate must be just as strict
            err = (
                "dtype mismatch (spark vs oracle): "
                f"{dtype_mismatches(spark_pdf, duck_pdf)}"
            )
            ok = False
        else:
            a, b = rows_key(spark_pdf), rows_key(duck_pdf)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                err = f"values differ, first diffs: {diffs}"
                ok = False
        if ok:
            print(f"PASS  {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            record[name] = {
                "status": "pass",
                "rows": len(spark_pdf),
                "sec": round(time.time() - t0, 1),
            }
            n_pass += 1
        else:
            print(f"FAIL  {name}: {err}")
            record[name] = {"status": "fail", "err": err}
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if only is None:  # full-surface run: persist the in-repo record
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        art = {
            "sf_dir": sf_dir,
            "checked": len(record),
            "pass": n_pass,
            "fail": n_fail,
            "rows_only": n_rows_only,
            "queries": record,
        }
        with open(os.path.join(repo, "CORRECTNESS_local.json"), "w") as f:
            json.dump(art, f, indent=1, default=str)
        print(f"wrote CORRECTNESS_local.json ({len(record)} queries)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
