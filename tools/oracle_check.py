#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate, for
running the graded surface at scale points the driver does not grade
(sf1). Compares each graft.Verify parquet dump against the oracle SQL
from oracle_sql.json executed by DuckDB over the same parquet tables.

Compare semantics mirror the driver: sort columns by name, sort rows by
all columns, then require (a) identical row counts, (b) identical
column names, (c) identical values (stringified, NaN-safe). Each oracle
query runs in a subprocess with a wall-clock timeout so the handful of
quadratic-by-design recall monitors cannot wedge the whole run; a
timeout is recorded as "oracle_timeout", not a pass.

Usage: oracle_check.py <verify_out_dir> <sf_dir> <result_json> [timeout_s]
"""
import json
import os
import subprocess
import sys
import tempfile

WORKER = r'''
import duckdb, glob, json, sys
import pyarrow.parquet as pq
import pandas as pd

out, sf, name, sql_file = sys.argv[1:5]
sql = open(sql_file).read()
con = duckdb.connect()
# long queries (sf1 recall monitors) otherwise draw progress bars into
# stdout, burying the JSON result line
con.execute("SET enable_progress_bar = false")
import os
for p in glob.glob(f"{sf}/*.parquet"):
    t = p.rsplit("/", 1)[1][:-8]
    # driver testdata is one file per table; GenTestData (Spark) writes
    # a directory of part files — glob inside it for DuckDB
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{pat}')")
oradf = con.execute(sql).fetchdf()
sdf = pq.read_table(glob.glob(f"{out}/{name}/*.parquet")).to_pandas()

def norm(df):
    # Dtype-normalize BEFORE stringifying: a nullable BIGINT surfaces as
    # float64 from one engine path and int64 from the other ('1.0' vs
    # '1', with precision loss past 2^53), so coerce float columns whose
    # non-null values are all integral back to nullable Int64, and map
    # nulls to a sentinel pre-str (NaN stringifies to 'nan'/'None'
    # inconsistently across dtypes).
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            nn = df[c].dropna()
            if len(nn) == 0 or bool((nn == nn.round()).all()):
                try:
                    df[c] = df[c].astype("Int64")
                except (TypeError, ValueError):
                    pass
    df = df.astype(object).where(df.notna(), "\x00NULL")
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

a, b = norm(sdf), norm(oradf)
res = {"rows_spark": len(a), "rows_oracle": len(b),
       "schema_match": list(a.columns) == list(b.columns)}
if res["schema_match"] and len(a) == len(b):
    res["value_match"] = bool(a.equals(b))
else:
    res["value_match"] = False
res["match"] = res["schema_match"] and res["value_match"] \
    and len(a) == len(b)
print(json.dumps(res))
'''


# Zero-row ratchet: both engines agreeing on an EMPTY frame is vacuous
# evidence (r13: training_set "passed" at sf1 on a 0-row result because
# the synthetic vocabulary saturated the decontamination gate). A graded
# entry may return 0 rows only if it is allowlisted here BY NAME with a
# reason; any other 0-row "match" is recorded as a failure so silent
# emptiness can never masquerade as correctness again.
ZERO_ROW_ALLOW = {
    # sf0.001/sf0.01: every customer has orders, so the anti-join is
    # legitimately empty at small SFs (non-empty at sf0.1+).
    "anti_join_no_orders",
}


def main():
    out_dir, sf_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    errors = {}
    err_path = os.path.join(out_dir, "_errors.json")
    if os.path.exists(err_path):
        errors = json.load(open(err_path))
    results = {}
    for name in sorted(oracle):
        if name in errors:
            results[name] = {"match": False, "error": errors[name]}
            print(f"{name}: SPARK-SIDE ERROR", flush=True)
            continue
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = {"match": False, "error": "no spark output"}
            print(f"{name}: NO OUTPUT", flush=True)
            continue
        with tempfile.NamedTemporaryFile("w", suffix=".sql",
                                         delete=False) as f:
            f.write(oracle[name])
            sql_file = f.name
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, out_dir, sf_dir, name,
                 sql_file],
                capture_output=True, text=True, timeout=timeout)
            if p.returncode != 0:
                results[name] = {"match": False,
                                 "error": p.stderr.strip()[-500:]}
                print(f"{name}: ORACLE ERROR", flush=True)
            else:
                # the result is the LAST parseable JSON line — duckdb/
                # pandas can append progress or warning lines to stdout,
                # and one unparseable tail line must fail THIS query,
                # not crash the whole run (r12: seen at sf1)
                parsed = None
                for line in reversed(p.stdout.strip().splitlines()):
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    # json.loads accepts bare scalars ('123', 'true');
                    # a stray numeric tail line must not masquerade as a
                    # result dict — only a dict carrying 'match' counts
                    if isinstance(cand, dict) and "match" in cand:
                        parsed = cand
                        break
                if parsed is None:
                    results[name] = {
                        "match": False,
                        "error": "no JSON in worker stdout: "
                                 + p.stdout.strip()[-300:]}
                    print(f"{name}: WORKER OUTPUT UNPARSEABLE", flush=True)
                else:
                    if parsed.get("match") \
                            and parsed.get("rows_spark") == 0 \
                            and name not in ZERO_ROW_ALLOW:
                        parsed["match"] = False
                        parsed["error"] = ("vacuous_empty: 0-row result "
                                           "not allowlisted")
                    results[name] = parsed
                    print(f"{name}: "
                          f"{'MATCH' if parsed['match'] else 'MISMATCH'}"
                          f" ({parsed.get('rows_spark')} rows)",
                          flush=True)
        except subprocess.TimeoutExpired:
            results[name] = {"match": False, "error": "oracle_timeout",
                             "timeout_s": timeout}
            print(f"{name}: ORACLE TIMEOUT after {timeout}s", flush=True)
        finally:
            os.unlink(sql_file)
    n_match = sum(1 for r in results.values() if r.get("match"))
    summary = {"sf_dir": sf_dir, "n_queries": len(results),
               "n_match": n_match,
               "mismatches": sorted(k for k, r in results.items()
                                    if not r.get("match")),
               "queries": results}
    with open(result_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"TOTAL {n_match}/{len(results)} match -> {result_path}")


if __name__ == "__main__":
    main()
