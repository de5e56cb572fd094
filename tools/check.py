#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, and compares
against the Spark-written parquet in <verifyOutDir>/<name>/.

NOT part of the library — developer tooling only (driver-side python).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    spark_dirs = {os.path.basename(d): d
                  for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)}

    n_pass = n_fail = 0
    # union of declared oracles and written dirs: a query whose Spark side
    # threw in graft.Verify (dir never written) must count as FAIL, not
    # silently vanish from both tallies.
    for name in sorted(set(spark_dirs) | set(oracle)):
        if name not in spark_dirs:
            print(f"FAIL {name}: no spark output dir (query threw in Verify?)")
            n_fail += 1; continue
        d = spark_dirs[name]
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"rows-only {name}: {len(got)} rows {status}")
            if len(got) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1; continue
        # exact value compare (stringified, like a hash would see)
        ga = got.astype(str).values
        wa = want.astype(str).values
        diff = (ga != wa)
        if diff.any():
            idx = list(zip(*diff.nonzero()))[:5]
            print(f"FAIL {name}: {diff.sum()} cell diffs, first: ")
            for r, c in idx:
                print(f"  row {r} col {got.columns[c]}: spark={ga[r][c]!r} duck={wa[r][c]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
