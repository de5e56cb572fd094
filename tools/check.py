#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, and compares
against the Spark-written parquet in <verifyOutDir>/<name>/.

Scaled-fixture knobs (all default OFF so the sf0.01 driver-gate mirror
is byte-identical in behavior):
  GRAFT_ORACLE_JSON=<path>     also write a machine-readable summary
                               ({"n_pass":..,"queries":{name:status,..}})
  GRAFT_ORACLE_TIMEOUT_S=<n>   interrupt any single oracle SQL after n
                               seconds and count it SKIP (the 10x compare
                               runs DuckDB against 6M-row tables, where a
                               brute-force oracle can be intractable even
                               though the Spark side is linear)
  GRAFT_ORACLE_EXCLUDE=a,b,c   skip named queries outright (known
                               quadratic/recursive-CTE oracles at 10x).
                               Each entry may carry an IN-ARTIFACT
                               rationale after '=' (r14 VERDICT task 2):
                               GRAFT_ORACLE_EXCLUDE='a=why a;b=why b'
                               (';'-separated when rationales are given,
                               ','-separated for bare names). The JSON
                               summary's "excluded" field records
                               {name: rationale} so the artifact alone
                               justifies its own skips.

NOT part of the library — developer tooling only (driver-side python).
"""
import sys, os, json, glob, re, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # scaled fixtures are Spark-written DIRECTORIES of part files
            # (the driver's sf* tables are single files) — glob inside
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    spark_dirs = {os.path.basename(d): d
                  for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)}

    timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_S", "0") or 0)
    # exclude: {name: rationale}. PREFERRED shape (r15 ADVICE: any
    # in-band separator — ';', '||' — can legitimately appear in prose
    # and then fragments the entries): a JSON object, detected by a
    # leading '{'. round_final.sh passes this form. Legacy shapes stay
    # accepted: 'a=why||b=why' ('||'-separated), ';' separation only at
    # a boundary that starts a new 'name=' entry, and bare 'a,b' with
    # empty rationales.
    raw_excl = os.environ.get("GRAFT_ORACLE_EXCLUDE", "")
    exclude = {}
    if raw_excl.strip().startswith("{"):
        exclude = {str(k): str(v) for k, v in json.loads(raw_excl).items()}
    else:
        if "=" in raw_excl:
            parts = re.split(r"\|\|" if "||" in raw_excl
                             else r";(?=\s*[A-Za-z0-9_]+\s*=)", raw_excl)
        else:
            parts = raw_excl.split(",")
        for part in parts:
            part = part.strip()
            if not part:
                continue
            name, _, why = part.partition("=")
            exclude[name.strip()] = why.strip()

    def run_oracle(sql):
        """Run one oracle SQL, interrupting after timeout_s (0 = never).
        Returns (df, None) or (None, 'timeout')."""
        if timeout_s <= 0:
            return con.execute(sql).fetchdf(), None
        t = threading.Timer(timeout_s, con.interrupt)
        t.start()
        try:
            return con.execute(sql).fetchdf(), None
        except duckdb.InterruptException:
            return None, "timeout"
        finally:
            t.cancel()

    n_pass = n_fail = n_skip = 0
    statuses = {}
    # union of declared oracles and written dirs: a query whose Spark side
    # threw in graft.Verify (dir never written) must count as FAIL, not
    # silently vanish from both tallies.
    for name in sorted(set(spark_dirs) | set(oracle)):
        if name in exclude:
            why = exclude[name] or "excluded (no rationale given)"
            print(f"SKIP {name}: excluded — {why}")
            statuses[name] = "skip_excluded"
            n_skip += 1; continue
        if name not in spark_dirs:
            print(f"FAIL {name}: no spark output dir (query threw in Verify?)")
            statuses[name] = "fail_no_output"
            n_fail += 1; continue
        d = spark_dirs[name]
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            statuses[name] = "fail_no_output"; n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"rows-only {name}: {len(got)} rows {status}")
            statuses[name] = "rows_only" if len(got) else "fail_empty"
            if len(got) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            want, why = run_oracle(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            statuses[name] = "fail_oracle_error"; n_fail += 1; continue
        if why == "timeout":
            print(f"SKIP {name}: oracle exceeded {timeout_s:.0f}s (DuckDB "
                  "interrupted — intractable at this fixture scale)")
            statuses[name] = "skip_oracle_timeout"
            n_skip += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            statuses[name] = "fail_schema"; n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            statuses[name] = "fail_rows"; n_fail += 1; continue
        # exact value compare (stringified, like a hash would see)
        ga = got.astype(str).values
        wa = want.astype(str).values
        diff = (ga != wa)
        if diff.any():
            idx = list(zip(*diff.nonzero()))[:5]
            print(f"FAIL {name}: {diff.sum()} cell diffs, first: ")
            for r, c in idx:
                print(f"  row {r} col {got.columns[c]}: spark={ga[r][c]!r} duck={wa[r][c]!r}")
            statuses[name] = "fail_values"; n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            statuses[name] = "pass"; n_pass += 1

    skipped = f", {n_skip} skipped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    jpath = os.environ.get("GRAFT_ORACLE_JSON")
    if jpath:
        with open(jpath, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "n_pass": n_pass, "n_fail": n_fail, "n_skip": n_skip,
                       "oracle_timeout_s": timeout_s,
                       # {name: rationale} — the artifact must justify
                       # its own skips (r14 VERDICT task 2)
                       "excluded": exclude,
                       "queries": statuses}, f, indent=1, sort_keys=True)
            f.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
