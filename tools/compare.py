#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads each query's parquet dump from Verify, runs the oracle SQL in DuckDB
over the same sf tables, sorts columns by name and rows by value, and
reports row/schema/value match per query.
"""
import json, sys, glob, os, threading
import duckdb
import numpy as np
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
# optional per-oracle time limit in seconds (0 = none); lets the full
# query set run against large fixtures where a few oracles (recursive
# CTEs, 64-slot minhash in SQL) are orders slower than the engine
timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written dataset dir (e.g. FixtureScale output)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    else:
        continue
    # The driver's events.parquet carries TIMESTAMP(NANOS); Spark rewrites
    # (FixtureScale) can only emit the raw nanos as BIGINT. Normalize back
    # to a timestamp so the oracles' epoch(ts) binds either way.
    if t == "events":
        typ = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
        if typ and typ[0] == "BIGINT":
            con.execute(
                "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM '{p}/*.parquet'"
                if os.path.isdir(p) else
                "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = ulp = 0
for name in sorted(os.listdir(out_dir)):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        print(f"{name:25s} NO-ORACLE rows={len(got)}")
        continue
    # Timer/interrupt race: the timer can fire AFTER the query finishes
    # but BEFORE cancel(), leaving a pending interrupt on the shared
    # connection that would abort the NEXT oracle spuriously. Track
    # whether THIS query's timer actually fired; after cancel(), absorb
    # any pending interrupt with a trivial statement, and retry once on
    # an InterruptException whose own timer never fired.
    exp = None
    timed_out = False
    err_reported = False
    for _attempt in range(2):
        fired = threading.Event()
        timer = None
        if timeout_s > 0:
            timer = threading.Timer(
                timeout_s, lambda: (fired.set(), con.interrupt()))
            timer.start()
        try:
            exp = con.execute(oracle[name]).fetchdf()
            break
        except duckdb.InterruptException:
            if fired.is_set():
                timed_out = True
                break
            # stale interrupt from a previous query's timer — retry once
            continue
        except Exception as e:
            print(f"{name:25s} ORACLE-ERROR {str(e)[:120]}")
            fail += 1
            err_reported = True
            break
        finally:
            if timer:
                timer.cancel()
                if fired.is_set():
                    # interrupt may still be pending if the query won the
                    # race; absorb it so the next oracle starts clean
                    try:
                        con.execute("SELECT 1").fetchall()
                    except duckdb.InterruptException:
                        pass
    if timed_out:
        print(f"{name:25s} ORACLE-TIMEOUT >{timeout_s:.0f}s (not counted)")
        continue
    if exp is None:
        # retry loop exhausted without a result, timeout, or reported
        # error (e.g. two stale interrupts) — a silent skip would read
        # as success, so count it
        if not err_reported:
            print(f"{name:25s} ORACLE-ERROR no result after retries")
            fail += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if sorted(g.columns) != sorted(e.columns):
        print(f"{name:25s} SCHEMA-MISMATCH got={sorted(g.columns)} exp={sorted(e.columns)}")
        fail += 1
        continue
    if len(g) != len(e):
        print(f"{name:25s} ROWS-MISMATCH got={len(g)} exp={len(e)}")
        fail += 1
        continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    # The driver's hash is dtype-sensitive: an oracle column whose pandas
    # dtype differs from the Spark parquet dtype (e.g. DuckDB HUGEINT ->
    # float64 vs Spark int64) hash-fails even on equal values. Flag it as
    # FAIL here instead of silently coercing, but normalize away
    # representation-only differences that the driver also tolerates:
    # datetime64 tick resolution (ns vs us) carries no value information.
    dtype_bad = []
    for c in gs.columns:
        gd, ed = gs[c].dtype, es[c].dtype
        if gd == ed:
            continue
        if gd.kind == "M" and ed.kind == "M":  # same kind, resolution-only
            es[c] = es[c].astype(gd)
            continue
        dtype_bad.append(f"{c}(spark={gd},oracle={ed})")
        try:
            es[c] = es[c].astype(gd)  # coerce so value diff still prints
        except Exception:
            pass
    if dtype_bad:
        print(f"{name:25s} DTYPE-MISMATCH {' '.join(dtype_bad)}")
        fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        # assert_frame_equal treats -0.0 == +0.0, but the driver hashes raw
        # bit patterns — a sign-bit-only diff (DuckDB ceil(x in (-1,0)) ->
        # -0.0 vs Spark +0.0) ships silently without this check.
        signbad = []
        for c in gs.columns:
            if gs[c].dtype.kind == "f" and es[c].dtype.kind == "f":
                gv, ev = gs[c].to_numpy(), es[c].to_numpy()
                m = (np.signbit(gv) ^ np.signbit(ev)) & ~(np.isnan(gv) | np.isnan(ev))
                if m.any():
                    signbad.append(f"{c}({int(m.sum())} rows)")
        if signbad:
            print(f"{name:25s} SIGNBIT-MISMATCH {' '.join(signbad)}")
            fail += 1
            continue
        print(f"{name:25s} OK rows={len(g)}")
        ok += 1
    except AssertionError as ex:
        diff = (gs != es) & ~(gs.isna() & es.isna())
        ndiff = int(diff.any(axis=1).sum())
        # Half-ULP rounding knife edge: oracles ending in round(avg(x), 6)
        # flip their 6th decimal when the pre-rounded sums differ by one
        # double ULP (summation order differs between engines). Classify a
        # mismatch whose every differing cell is float and within 1e-6 as
        # its own bucket — visible (NOT counted OK; the driver's hash gate
        # is exact) but distinct from a genuine value divergence, so large-
        # fixture boards aren't drowned by arithmetic-order noise.
        ulp_only = ndiff > 0
        for c in gs.columns:
            cb = diff[c]
            if not cb.any():
                continue
            if gs[c].dtype.kind != "f" or es[c].dtype.kind != "f":
                ulp_only = False
                break
            if not ((gs[c][cb] - es[c][cb]).abs() <= 1.0000001e-6).all():
                ulp_only = False
                break
        if ulp_only:
            print(f"{name:25s} ULP-BOUNDARY {ndiff}/{len(gs)} rows differ "
                  "by <=1e-6 (rounded-avg knife edge)")
            ulp += 1
            continue
        print(f"{name:25s} VALUE-MISMATCH {ndiff}/{len(gs)} rows differ")
        bad = diff.any(axis=1)
        print("  got:", gs[bad].head(3).to_dict("records"))
        print("  exp:", es[bad].head(3).to_dict("records"))
        fail += 1
print(f"\n{ok} OK, {fail} FAIL" + (f", {ulp} ULP-BOUNDARY" if ulp else ""))
