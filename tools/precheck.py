#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
Spark library). Runs each oracle SQL from Verify's oracle_sql.json in
DuckDB over the same testdata parquet, loads the corresponding Spark
result parquet, and compares: columns sorted by name, rows sorted,
exact value equality (floats compared bitwise-exact).

Usage: python3 tools/precheck.py <sfDir> <verifyOutDir>

GRAFT_ORACLE_TIMEOUT=<seconds> (optional) interrupts a DuckDB oracle
that exceeds the budget and records the query as SKIP (oracle
infeasible at this scale — e.g. the all-pairs or recursive-CTE
oracles at sf1) instead of hanging the whole gate.

GRAFT_JSON_OUT=<path> (optional) additionally writes the per-query
results as a CORRECTNESS_r*-shaped json artifact.
"""
import json, sys, glob, os, threading
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total, type-insensitive ordering + compare
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

    def run_oracle(sql: str):
        box = {}
        def work():
            try: box["df"] = con.sql(sql).df()
            except Exception as e: box["err"] = e
        if timeout <= 0:
            work()
        else:
            th = threading.Thread(target=work, daemon=True)
            th.start(); th.join(timeout)
            if th.is_alive():
                con.interrupt(); th.join(30)
                # the interrupt surfaces in the worker as a duckdb
                # InterruptException — either way this is a timeout
                box["err"] = TimeoutError(f"oracle > {timeout}s")
        if "err" in box: raise box["err"]
        return box["df"]

    n_ok = n_bad = n_skip = 0
    results = {}
    def record(name, **kw):
        results[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": None,
                         "oracle_rows": None, "err": None, **kw}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err="no spark output")
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = run_oracle(sql)
        except TimeoutError as e:
            print(f"SKIP {name}: {e} (rows-only: spark={len(con.sql(f'SELECT * FROM read_parquet({files!r})').df())})")
            n_skip += 1
            record(name, spark_rows=len(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()),
                err=f"oracle-infeasible: {e}")
            continue
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err=str(e))
            continue
        g, e = norm(got), norm(exp)
        record(name, spark_rows=len(g), oracle_rows=len(e))
        if sorted(g.columns) != sorted(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            results[name].update(schema_match=False, rows_match=False,
                                 hash_match=False)
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            results[name].update(schema_match=True, rows_match=False,
                                 hash_match=False)
            n_bad += 1; continue
        ga, ea = g.astype(str), e.astype(str)
        if not ga.equals(ea):
            diff = (ga != ea).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first at {i}:")
            print("  spark :", g.loc[i].to_dict())
            print("  oracle:", e.loc[i].to_dict())
            results[name].update(schema_match=True, rows_match=True,
                                 hash_match=False)
            n_bad += 1; continue
        print(f"ok   {name}: {len(g)} rows")
        results[name].update(schema_match=True, rows_match=True,
                             hash_match=True)
        n_ok += 1
    skip = f", {n_skip} skip" if n_skip else ""
    print(f"== {n_ok} ok, {n_bad} fail{skip} ==")
    json_out = os.environ.get("GRAFT_JSON_OUT")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
