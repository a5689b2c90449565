#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB over the fixture parquet and compare (schema, row count,
exact values in order) against the Spark parquet dumps written by
graft.Verify. Usage: crosscheck.py <sfDir> <verifyOutDir>."""
import sys, os, glob, math, json
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Spill outside the work tree: an in-memory connection otherwise writes
    # multi-GB duckdb_temp_storage-*.tmp files under ./.tmp in the repo.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not res_glob:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        if len(res_glob) != 1:
            # Verify writes coalesce(1); >1 part would make the ordered
            # row-by-row compare depend on file order — fail explicitly.
            print(f"FAIL {name}: expected 1 parquet part, got {len(res_glob)}")
            n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        ok, msg = compare(spark_df, ora_df)
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(a, b):
    sa, sb = sorted(a.columns), sorted(b.columns)
    if sa != sb:
        return False, f"columns differ: spark={sa} oracle={sb}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} oracle={len(b)}"
    a, b = a[sa], b[sb]
    for cname in sa:
        ta, tb = str(a[cname].dtype), str(b[cname].dtype)
        if ta != tb:
            # schema is part of the driver's gate: a dtype drift must FAIL
            # here, not merely warn (int/float value coincidence hides it)
            return False, f"dtype mismatch col={cname}: spark={ta} oracle={tb}"
        ca, cb = a[cname].tolist(), b[cname].tolist()
        for i, (x, y) in enumerate(zip(ca, cb)):
            if not eq(x, y):
                return False, (f"value mismatch col={cname} row={i}: "
                               f"spark={x!r} oracle={y!r}")
    return True, ""

def isnull(v):
    if v is None: return True
    try:
        import pandas as pd
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False

def eq(x, y):
    nx, ny = isnull(x), isnull(y)
    if nx or ny:
        return nx and ny
    if isinstance(x, float) or isinstance(y, float):
        return float(x) == float(y)
    return x == y

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
