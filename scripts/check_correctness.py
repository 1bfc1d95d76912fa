"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf against the matching
``oracle_sql()`` via DuckDB: row count, schema (column names + dtype report),
and order-insensitive exact value comparison.  Queries without an oracle get a
rows-only check.

Usage: python scripts/check_correctness.py [sf_dir] [only_query_prefix...]
       CHECK_JSON_OUT=path.json python scripts/check_correctness.py sf_dir
(the JSON artifact mirrors the driver's CORRECTNESS_r{N}.json row shape so
committed evidence can be refreshed to match HEAD between driver rounds)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from pyspark_engine import llmops
from pyspark_engine.runtime import TABLES, build_session


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        issues.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return issues
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            issues.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
    if len(s) == len(d):
        try:
            s2 = s.astype(str).fillna("<null>")
            d2 = d.astype(str).fillna("<null>")
            neq = (s2 != d2).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                issues.append(
                    f"values differ in {int(neq.sum())}/{len(s)} rows; first at {i}:\n"
                    f"  spark: {s.iloc[i].to_dict()}\n  duck : {d.iloc[i].to_dict()}"
                )
        except Exception as e:  # noqa: BLE001
            issues.append(f"value compare failed: {e}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = build_session(cpus=8, shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if os.environ.get("CHECK_INJECT_SCALEBUG") == "1":
        # self-test hook for the close gate's sf0.1 sample (r10 verdict item
        # 3): a deliberately cardinality-dependent wrong answer — the Spark
        # side caps a count that only exceeds the cap at sf >= 0.1, so the
        # query is GREEN at sf0.01 and RED at sf0.1.  Proves the sampled
        # scale gate can catch the wrong-only-at-scale class; never set
        # outside tests/test_evidence_gate.py.
        def _scalebug(spark, sf_dir):
            from pyspark.sql import functions as F  # noqa: PLC0415

            df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            return df.agg(F.least(F.count(F.lit(1)), F.lit(100_000)).alias("n_rows"))

        qs["zz_injected_scalebug"] = _scalebug
        oracles["zz_injected_scalebug"] = "SELECT COUNT(*) AS n_rows FROM lineitem"
    n_pass = n_fail = n_rows_only = 0
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and not any(name.startswith(o) for o in only):
            continue
        t0 = time.time()
        llmops.release_cache()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": None, "oracle_rows": None, "err": "spark_error"}
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            status = "ROWS" if len(sdf) >= 0 else "??"
            n_rows_only += 1
            record[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle"}
            print(f"{status}  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            n_fail += 1
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                            "spark_rows": len(sdf), "oracle_rows": None, "err": "duckdb_error"}
            print(f"FAIL  {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            continue
        issues = compare(name, sdf, ddf)
        real = [i for i in issues if not i.startswith("dtype")]
        dtype_warn = [i for i in issues if i.startswith("dtype")]
        record[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": not any(i.startswith("columns") for i in real),
            "hash_match": not real,
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": "; ".join(real) if real else None,
        }
        if real:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(real))
        else:
            n_pass += 1
            warn = f"  [warn {'; '.join(dtype_warn)}]" if dtype_warn else ""
            print(f"PASS  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s){warn}")
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    if failures:
        print("failures:", " ".join(failures))
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {out_path} ({len(record)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
