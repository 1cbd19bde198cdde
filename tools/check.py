#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run graft.Verify first to populate <outDir>)

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same source
tables, sorts columns by name, and compares values exactly.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        # Verify writes a 1-row error frame for a query that threw, so the
        # name can never silently vanish from the report (round-5 lesson);
        # surface it as a FAIL even for oracle-less (rows-only) queries.
        if "_graft_query_failed" in got.columns:
            results[name] = f"QUERY_FAILED {got['_graft_query_failed'].iloc[0]!r}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            results[name] = f"SCHEMA_MISMATCH exp={list(exp.columns)} got={list(got.columns)}"
            continue
        if len(exp) != len(got):
            results[name] = f"ROWCOUNT_MISMATCH exp={len(exp)} got={len(got)}"
            continue
        bad = None
        for ci, c in enumerate(exp.columns):
            ev, gv = exp[c].tolist(), got[c].tolist()
            for ri in range(len(ev)):
                e, g = ev[ri], gv[ri]
                if isinstance(e, float) and isinstance(g, float):
                    if math.isnan(e) and math.isnan(g):
                        continue
                    if e != g:
                        bad = (c, ri, e, g, abs(e - g))
                        break
                elif str(e) != str(g):
                    bad = (c, ri, e, g, None)
                    break
            if bad:
                break
        if bad:
            c, ri, e, g, delta = bad
            results[name] = f"VALUE_MISMATCH col={c} row={ri} exp={e!r} got={g!r} delta={delta}"
        else:
            results[name] = f"OK rows={len(got)}"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        mark = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{mark}] {k}: {v}")
    missing = sorted(set(oracle) - set(results))
    for m in missing:
        print(f"[FAIL] {m}: NO_RESULT_DIR (query crashed in Verify?)")
    print(f"== {npass}/{len(results)} pass, {len(missing)} missing ==")
    sys.exit(0 if npass == len(results) and not missing else 1)

if __name__ == "__main__":
    main()
