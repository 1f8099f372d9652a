#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>
Registers each parquet table as a DuckDB view, runs every oracle SQL,
and compares against the Spark-dumped parquet (columns sorted by name,
rows sorted, values hashed)."""
import sys, json, glob, duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        import datetime
        for c in df.columns:
            if df[c].dtype == object:
                nonnull = df[c].dropna()
                # spark DATE columns arrive as object-of-datetime.date;
                # align them with duckdb's datetime64 instead of str
                if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                    df[c] = pd.to_datetime(df[c])
                else:
                    df[c] = df[c].astype(str)
            if np.issubdtype(df[c].dtype, np.datetime64):
                df[c] = df[c].astype("datetime64[us]")
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    exp_n, got_n = norm(exp), norm(got)
    if list(exp_n.columns) != list(got_n.columns):
        fails.append(name); print(f"FAIL {name}: columns {list(got_n.columns)} vs oracle {list(exp_n.columns)}"); continue
    if len(exp_n) != len(got_n):
        fails.append(name); print(f"FAIL {name}: rows {len(got_n)} vs oracle {len(exp_n)}"); continue
    try:
        pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False, check_exact=True)
        # assert_frame_equal (numpy ==) treats -0.0 == 0.0, but the
        # driver's compare hashes bytes — enforce signbit agreement on
        # float columns so the local gate is at least as strict (the
        # r6 q_corr signed-zero escape can never pass locally again)
        for c in got_n.columns:
            gd, ed = got_n[c].dtype, exp_n[c].dtype
            if (np.issubdtype(gd, np.floating) or np.issubdtype(ed, np.floating)) \
               and np.issubdtype(gd, np.number) and np.issubdtype(ed, np.number):
                # coerce BOTH sides: an int-vs-float dtype drift must not
                # silently skip the signbit comparison (non-numeric object
                # columns were already stringified and exact-compared above)
                g = got_n[c].to_numpy().astype(np.float64)
                e2 = exp_n[c].to_numpy().astype(np.float64)
                ok = np.isnan(g) | (np.signbit(g) == np.signbit(e2))
                if not ok.all():
                    i = int(np.argmin(ok))
                    raise AssertionError(
                        f"signed-zero/signbit mismatch in '{c}' row {i}: "
                        f"spark {g[i]!r} vs oracle {e2[i]!r}")
        print(f"OK   {name} ({len(got_n)} rows)")
    except AssertionError as e:
        fails.append(name); print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
import os
all_keys = sorted(d for d in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, d)))
rows_only = sorted(set(all_keys) - set(oracle))
for name in rows_only:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    status = "ROWS" if n > 0 else "FAIL"
    if n == 0: fails.append(name)
    print(f"{status} {name} ({n} rows, rows-only by design)")
print(f"\n{len(oracle)-len([f for f in fails if f in oracle])}/{len(oracle)} "
      f"oracle-matched; {len(all_keys)} keys total, {len(rows_only)} rows-only "
      f"by design; fails: {fails}")
sys.exit(1 if fails else 0)
