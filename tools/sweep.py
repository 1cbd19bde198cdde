#!/usr/bin/env python3
"""10x-scale correctness sweep: the sf0.01 gate re-run at sf0.1.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/sweep_out"
  python3 tools/sweep.py /root/testdata/sf0.1 /tmp/sweep_out

Same compare as tools/check.py (columns sorted by name, exact values)
with two sweep-specific accommodations:

- A per-oracle TIMEOUT (default 90 s, override with --timeout N): some
  oracles are deliberately quadratic ground truths (the all-pairs
  similarity rows) that DuckDB grinds on for hours at sf0.1; they are
  reported TIMEOUT and counted separately, not failed — the engine-side
  result still ran, and the row stays oracle-checked at sf0.01.
- A BY-DESIGN list: sketch gate rows whose under-fill exactness argument
  holds only at sf0.01 capacities (the estimator leaves its exact regime
  at 10x — documented in their Scaladoc). They are expected to mismatch
  and are reported as such, not failed.

Exit 0 when every row is OK / ROWS_ONLY / TIMEOUT / BY_DESIGN.
"""
import sys, os, json, math, threading, argparse
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Under-filled-sketch rows: exact only within sf0.01 capacity (see each
# query's Scaladoc for the capacity argument that breaks at 10x).
BY_DESIGN = {
    "q246_kmv_distinct", "q248_incremental_rollup",
    "q249_stream_distinct_sketch", "q253_stream_heavy_hitters",
    "q286_kmv_set_ops",
    # ndv_order over-fills its 65536-capacity KMV at sf0.1 (per-flag
    # orderkey NDV > k) and degrades to the +-1/sqrt(k-2) estimate;
    # ndv_part stays exact (see q303's Scaladoc)
    "q303_approx_ndv_exact",
}


def run_with_timeout(con, sql, seconds):
    """Returns (df, status) with status in {None, 'timeout', 'error: ...'}.

    A genuine oracle SQL error must NOT be reported as a timeout (a
    verification tool that masks its own failures is worse than none).
    The timer flags interrupt intent; each query runs on its own cursor
    so a late-firing interrupt cannot poison the next oracle."""
    interrupted = threading.Event()
    cur = con.cursor()  # own connection state; shares the view catalog

    def fire():
        interrupted.set()
        cur.interrupt()

    timer = threading.Timer(seconds, fire)
    timer.start()
    try:
        df = cur.execute(sql).fetchdf()
        if interrupted.is_set():  # raced the finish line: treat as timeout
            return None, "timeout"
        return df, None
    except Exception as e:
        return None, ("timeout" if interrupted.is_set() else f"error: {e}")
    finally:
        timer.cancel()
        cur.close()


def compare(exp, got):
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        return f"SCHEMA_MISMATCH exp={list(exp.columns)} got={list(got.columns)}"
    if len(exp) != len(got):
        return f"ROWCOUNT_MISMATCH exp={len(exp)} got={len(got)}"
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for ri in range(len(ev)):
            e, g = ev[ri], gv[ri]
            if isinstance(e, float) and isinstance(g, float):
                if math.isnan(e) and math.isnan(g):
                    continue
                if e != g:
                    return f"VALUE_MISMATCH col={c} row={ri} exp={e!r} got={g!r} delta={abs(e-g)}"
            elif str(e) != str(g):
                return f"VALUE_MISMATCH col={c} row={ri} exp={e!r} got={g!r}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sfdir")
    ap.add_argument("outdir")
    ap.add_argument("--timeout", type=int, default=90)
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(args.outdir, "oracle_sql.json")))
    counts = {"OK": 0, "ROWS_ONLY": 0, "TIMEOUT": 0, "BY_DESIGN": 0, "FAIL": 0}
    for name in sorted(os.listdir(args.outdir)):
        path = os.path.join(args.outdir, name)
        if not os.path.isdir(path):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        if "_graft_query_failed" in got.columns:
            counts["FAIL"] += 1
            print(f"[FAIL] {name}: QUERY_FAILED "
                  f"{got['_graft_query_failed'].iloc[0]!r}")
            continue
        if name not in oracle:
            counts["ROWS_ONLY"] += 1
            print(f"[INFO] {name}: ROWS_ONLY rows={len(got)}")
            continue
        exp, status = run_with_timeout(con, oracle[name], args.timeout)
        if exp is None and status == "timeout":
            counts["TIMEOUT"] += 1
            print(f"[TIME] {name}: oracle exceeded {args.timeout}s")
            continue
        if exp is None:
            counts["FAIL"] += 1
            print(f"[FAIL] {name}: ORACLE_SQL_{status}")
            continue
        bad = compare(exp, got)
        if bad and name in BY_DESIGN:
            counts["BY_DESIGN"] += 1
            print(f"[DSGN] {name}: expected 10x mismatch ({bad})")
        elif bad:
            counts["FAIL"] += 1
            print(f"[FAIL] {name}: {bad}")
        else:
            counts["OK"] += 1
            print(f"[PASS] {name}: OK rows={len(got)}")
    missing = sorted(set(oracle) -
                     {n for n in os.listdir(args.outdir)
                      if os.path.isdir(os.path.join(args.outdir, n))})
    for m in missing:
        counts["FAIL"] += 1
        print(f"[FAIL] {m}: NO_RESULT_DIR")
    print(f"== sweep: {counts} ==")
    sys.exit(0 if counts["FAIL"] == 0 else 1)


if __name__ == "__main__":
    main()
