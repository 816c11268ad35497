#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
(already done by caller via sbt), then execute each oracle SQL in DuckDB
against the same parquet tables and compare to the Spark result dump.

Usage: python3 tools/check.py <sfDir> <outDir> [--budget SECONDS]

--budget caps each ORACLE's DuckDB runtime (the Spark side already ran):
an over-budget oracle replay is reported as SKIP, not FAIL — used by the
once-per-round sf0.1 pass, where a few brute-force/recursive-CTE oracle
restatements are quadratic in DuckDB while the operators under test are
not. The driver's sf0.01 gate passes no budget and behaves as before.
"""
import json
import math
import sys
import threading

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Declared APPROXIMATE queries: sketch estimates (HLL / theta / KMV) whose
# oracle restates the EXACT answer. At sf0.01 the NDV proofs make them
# exact and they hash-match; at larger scale they diverge BY DESIGN within
# the sketch's error bound. Numeric columns compare within the relative
# bound below and report "OK~ (within N%)" instead of a misleading FAIL.
APPROX_BOUNDS = {
    "q_rollup_hll": 0.05,
    "q_theta_distinct": 0.05,
}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, budget: float = 0.0) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_raw = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under both 'name' and 'name.parquet' keys
    # (the driver looks up by output filename); normalize + dedupe here.
    oracle = {}
    for k, v in oracle_raw.items():
        oracle[k[:-len(".parquet")] if k.endswith(".parquet") else k] = v
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}.parquet")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        timer = None
        timed_out = []
        done = [False]
        lock = threading.Lock()
        if budget > 0:
            def cancel():
                # never interrupt after the query finished: a timer firing
                # between query end and cancel() would otherwise leave a
                # pending interrupt that kills the NEXT query (reported
                # FAIL instead of SKIP)
                with lock:
                    if not done[0]:
                        timed_out.append(True)
                        con.interrupt()
            timer = threading.Timer(budget, cancel)
            timer.start()
        ok_exec = False
        try:
            exp = con.execute(sql).df()
            ok_exec = True
        except Exception as e:
            # classify by the EXCEPTION, not just the timer flag: a timer
            # firing concurrently with a genuine oracle error must not
            # turn that error into a SKIP (hiding a correctness break)
            is_interrupt = (type(e).__name__ == "InterruptException"
                            or "INTERRUPT" in str(e).upper())
            if timed_out and is_interrupt:
                print(f"SKIP {name}: oracle over {budget:.0f}s budget")
                n_skip += 1
            else:
                print(f"FAIL {name}: oracle error {e}")
                n_bad += 1
            continue
        finally:
            with lock:
                done[0] = True
            if timer:
                timer.cancel()
            if timed_out:
                # the timer fired but its interrupt was not consumed by a
                # query abort (query completed, or failed on its own):
                # absorb the pending flag on a throwaway statement so the
                # NEXT query starts clean
                try:
                    con.execute("SELECT 1")
                except Exception:
                    pass
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        bad = (c, i, a, b)
                        break
                elif str(a) != str(b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad and name in APPROX_BOUNDS:
            # declared approximate: numeric columns within the relative
            # bound pass as OK~, everything else must still match exactly
            bound = APPROX_BOUNDS[name]
            def within(a, b):
                try:
                    fa, fb = float(a), float(b)
                except (TypeError, ValueError):
                    return str(a) == str(b)
                if math.isnan(fa) and math.isnan(fb):
                    return True
                return abs(fa - fb) <= bound * max(abs(fa), abs(fb), 1.0)
            approx_bad = None
            for c in g.columns:
                for i, (a, b) in enumerate(zip(g[c].tolist(), e[c].tolist())):
                    if not within(a, b):
                        approx_bad = (c, i, a, b)
                        break
                if approx_bad:
                    break
            if approx_bad:
                print(f"FAIL {name}: col={approx_bad[0]} row={approx_bad[1]} "
                      f"spark={approx_bad[2]!r} duck={approx_bad[3]!r} "
                      f"(outside {bound:.0%} approx bound)")
                n_bad += 1
            else:
                print(f"OK~  {name} ({len(g)} rows, within {bound:.0%} sketch bound)")
                n_ok += 1
        elif bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    skip_sfx = f", {n_skip} skip (oracle budget)" if n_skip else ""
    print(f"== {n_ok} ok, {n_bad} fail{skip_sfx} ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("sf_dir")
    p.add_argument("out_dir")
    p.add_argument("--budget", type=float, default=0.0,
                   help="max seconds per DuckDB oracle; over-budget = SKIP")
    a = p.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, a.budget))
