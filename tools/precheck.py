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

# ---------------------------------------------------------------------------
# Python oracles: exact fallbacks for the two queries whose DuckDB
# statements are infeasible at sf1 (x30's recursive-CTE closure,
# x35's all-pairs join). Each recomputes the EXPECTED result by an
# independent algorithm and feeds it through the same norm/compare
# machinery, so rows/schema/hash verdicts stay genuine. They run only
# when the SQL oracle times out (GRAFT_ORACLE_TIMEOUT); at the
# correctness SFs the SQL statements remain the oracle of record.

def py_oracle_x30(con, run_oracle, sql, sf_dir):
    """Union-find replay: DuckDB still computes the node set and the
    verified edge list (the same CTE chain as x04's oracle, which
    passes at sf1 in-budget); only the transitive closure — the part
    whose recursive CTE blows up — is replaced, by an exact
    union-find with min-id labels. Independent of Spark end to end."""
    head = sql.split("reach(id, lbl) AS")[0].rstrip().rstrip(",")
    both = run_oracle(head + """
        SELECT 'n' AS kind, rep AS a, NULL AS b FROM sigs
        UNION ALL SELECT 'e', src, dst FROM edges""")
    nodes = [int(a) for k, a, _ in both.itertuples(index=False) if k == "n"]
    edges = [(int(a), int(b)) for k, a, b in both.itertuples(index=False)
             if k == "e"]
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r: r = parent[r]
        while parent.get(x, x) != x: parent[x], x = r, parent[x]
        return r
    for n in nodes: parent.setdefault(n, n)
    for a, b in edges:
        parent.setdefault(a, a); parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb: parent[ra] = rb
    lbl = {}
    for n in parent: lbl.setdefault(find(n), []).append(n)
    comp = {n: min(ms) for ms in lbl.values() for n in ms}
    rows = sorted((n, comp[n]) for n in nodes)
    return pd.DataFrame(rows, columns=["rep", "component"])

def py_oracle_x35(con, run_oracle, sql, sf_dir):
    """Exact set-similarity self-join, independently: classic k=1
    PPJoin (df-ascending prefix index + length filter + exhaustive
    Jaccard verify of every candidate) in pure Python. The Spark side
    prunes with the k=2 PAIR-prefix lemma — different pruning logic,
    so an unsound lemma or implementation bug on either side breaks
    the hash compare instead of cancelling out."""
    import re
    from fractions import Fraction
    thr_s = re.search(r">=\s*([0-9.]+)\s*ORDER", sql).group(1)
    thr = float(thr_s)        # the engines' double-compare threshold
    thr_f = Fraction(thr_s)   # exact, for provably-lossless pruning:
    # float ceil(n*t) can land one above the true bound and silently
    # drop a boundary pair — prune with exact rationals, filter with
    # the same IEEE double compare Spark and DuckDB both apply
    def ceil_nt(n):
        return -((-n * thr_f.numerator) // thr_f.denominator)
    docs = con.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
                   ).df()
    groups = {}  # distinct token set -> min doc_id (the rep)
    for doc_id, text in docs.itertuples(index=False):
        key = frozenset(text.split(" "))
        i = int(doc_id)
        if key not in groups or i < groups[key]: groups[key] = i
    df_cnt = {}
    for key in groups:
        for t in key: df_cnt[t] = df_cnt.get(t, 0) + 1
    order = {t: r for r, t in
             enumerate(sorted(df_cnt, key=lambda t: (df_cnt[t], t)))}
    sets = []  # (rep, sorted-rank tuple, rank set)
    for key, rep in groups.items():
        ranks = sorted(order[t] for t in key)
        sets.append((rep, ranks, set(ranks)))
    sets.sort(key=lambda s: len(s[1]))  # probe small -> large
    index = {}  # token rank -> list of set indices (all smaller/equal n)
    out = []
    for qi, (rep_q, ranks_q, set_q) in enumerate(sets):
        n_q = len(ranks_q)
        plen = n_q - ceil_nt(n_q) + 1
        seen = set()
        for r in ranks_q[:plen]:
            for ci in index.get(r, ()):
                if ci in seen: continue
                seen.add(ci)
                rep_c, ranks_c, set_c = sets[ci]
                n_c = len(ranks_c)
                if n_c < ceil_nt(n_q): continue  # length filter
                inter = len(set_q & set_c)
                jac = inter / (n_q + n_c - inter)
                if jac >= thr:
                    a, b = min(rep_q, rep_c), max(rep_q, rep_c)
                    out.append((a, b, jac))
        for r in ranks_q[:plen]:
            index.setdefault(r, []).append(qi)
    out.sort()
    return pd.DataFrame(out, columns=["rep_a", "rep_b", "jac"])

PY_ORACLES = {"x30_dedup_components": py_oracle_x30,
              "x35_setjoin_prefix": py_oracle_x35}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total, type-insensitive ordering + compare
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def main(sf_dir: str, out_dir: str) -> int:
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

    def run_oracle(sql: str):
        nonlocal con
        box = {}
        target = con
        def work():
            try: box["df"] = target.sql(sql).df()
            except Exception as e: box["err"] = e
        if timeout <= 0:
            work()
        else:
            th = threading.Thread(target=work, daemon=True)
            th.start(); th.join(timeout)
            if th.is_alive():
                con.interrupt(); th.join(30)
                if th.is_alive():
                    # interrupt didn't land — the stuck worker still
                    # holds the connection, so abandon it and open a
                    # fresh one for the remaining queries rather than
                    # racing the zombie on shared state
                    con = connect(sf_dir)
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
    only = os.environ.get("GRAFT_ONLY")
    only = set(only.split(",")) if only else None
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            # record the unselected gate explicitly: a filtered run's
            # JSON must be distinguishable from a full green sweep
            record(name, err="filtered (GRAFT_ONLY)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err="no spark output")
            continue
        method = None
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = run_oracle(sql)
        except TimeoutError as e:
            if name in PY_ORACLES:
                # exact python fallback (see PY_ORACLES) — the result
                # flows through the same norm/compare below, so the
                # rows/schema/hash verdicts are real, just produced by
                # an independent algorithm instead of the SQL text
                try:
                    exp = PY_ORACLES[name](con, run_oracle, sql, sf_dir)
                    method = f"py-oracle ({PY_ORACLES[name].__doc__.split(':')[0]})"
                    print(f"  .. {name}: sql oracle > budget, "
                          f"py-oracle recomputed {len(exp)} rows")
                except Exception as e2:
                    print(f"SKIP {name}: {e}; py-oracle also failed: {e2}")
                    n_skip += 1
                    record(name, spark_rows=len(got),
                           err=f"oracle-infeasible: {e}; py-oracle: {e2}")
                    continue
            else:
                # `got` was read before the oracle ran — reuse it
                print(f"SKIP {name}: {e} (rows-only: spark={len(got)})")
                n_skip += 1
                record(name, spark_rows=len(got),
                       err=f"oracle-infeasible: {e}")
                continue
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err=str(e))
            continue
        g, e = norm(got), norm(exp)
        record(name, spark_rows=len(g), oracle_rows=len(e),
               **({"method": method} if method else {}))
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
    n_filt = sum(1 for r in results.values()
                 if r.get("err") == "filtered (GRAFT_ONLY)")
    filt = f", {n_filt} filtered (GRAFT_ONLY)" if n_filt else ""
    print(f"== {n_ok} ok, {n_bad} fail{skip}{filt} ==")
    json_out = os.environ.get("GRAFT_JSON_OUT")
    if json_out:
        # per-gate values stay homogeneous dicts (a filtered run is
        # already visible per-gate via err="filtered (GRAFT_ONLY)");
        # run-level metadata must not be injected into the gate map
        # where a consumer iterating results.values() would trip on it
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
