#!/bin/bash
# Parameterized round-close evidence chain (r14 VERDICT task 3 — the
# per-round copy-paste of round{N}_runs.sh kept leaving driver records
# untracked at round close). Runs the full final-binary chain and
# git-adds every record it produces, so `git status` is clean at close.
#
#   tools/round_final.sh <round>        e.g. tools/round_final.sh 15
#
# Sequential — benches never share the box. Run only when otherwise
# idle and AFTER sbt test is green.
#
# r14 ADVICE: set -o pipefail and no `|| true` on bench/verify steps —
# a failed run must fail the script, never silently produce empty/stale
# evidence that downstream guard/growth steps then adjudicate. Guard
# adjudications (bench_guard) are allowed to FLAG without killing the
# chain (the flag report IS the evidence), but missing/empty artifacts
# abort.
set -euo pipefail
cd /root/repo

R="${1:?usage: tools/round_final.sh <round-number>}"
export SPARK_GRAFT_CPUS=32

echo "=== [0/9] adopt previous round's driver-written records ==="
# The driver writes BENCH_r{N}.json / CORRECTNESS_r{N}.json /
# BENCH_SELF_r{N}.json / LEAKCHECK.json / VERDICT.md / ADVICE.md AFTER
# the builder's last commit, so they can sit untracked at round open
# (r15 VERDICT task 2). Adopt them structurally: stage and commit ONLY
# those paths if any are new/modified, before this round's chain runs.
# Per-path guarded adds (r16 ADVICE): a single git add with any
# non-matching pathspec aborts rc=128 staging NOTHING — silently
# re-creating the untracked-records problem this step exists to fix.
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_SELF_r*.json \
  LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md; do
  # explicit if, not `[ -e ] &&`: under set -e a trailing failed
  # short-circuit in the loop body would abort the whole chain.
  # check-ignore: a gitignored record (COPYCHECK.json) makes git add
  # exit 1, which under set -e would also kill the chain.
  if [ -e "$f" ] && ! git check-ignore -q "$f"; then git add -- "$f"; fi
done
if ! git diff --cached --quiet; then
  git commit -m "Adopt previous round's driver-written records"
else
  echo "nothing to adopt (driver records already tracked)"
fi

# The two 10x oracle excludes, WITH their in-artifact rationales
# (r14 VERDICT task 2): check.py records {name: rationale} in the
# CORRECTNESS_10x artifact so it justifies its own skips. JSON object
# shape (r15 ADVICE: every in-band separator — ';', '||' — can appear
# in prose and then fragments the entries; JSON cannot).
# r16 (r15 VERDICT task 6): both excludes are now BOUND-BACKED at the
# excluded scale itself — simjoin_prefix_bound and
# dedup_incremental_simjoin_bound run the excluded pipelines at 10x
# under expected-empty planted-exactness oracles, so the skips carry a
# positive scaled signal, not just prose.
EXCL='{"dedup_incremental_simjoin": "brute-force NOT-EXISTS near-dup oracle compares every (batch doc x corpus doc) trigram set in DuckDB - O(n^2) at the 6M-row fixture (>300s, interrupted); the Spark side is the linear prefix-filtered R-S join, hash-exact at sf0.01, its planted-exactness is oracled AT THIS SCALE by dedup_incremental_simjoin_bound (expected-empty, runs in this artifact), and its pair recall is floor-oracled at every scale via neardup_recall_bounds", "simjoin_prefix": "oracle brute-forces exact Jaccard over all O(n^2) doc pairs in DuckDB - intractable at 6M rows; the Spark side touches only prefix-filter candidates (linear in candidates), is hash-exact at sf0.01, its planted-exactness is oracled AT THIS SCALE by simjoin_prefix_bound (expected-empty, runs in this artifact), and planted-pair recall is bound-oracled via neardup_recall_bounds"}'

require_nonempty() {
  for f in "$@"; do
    [ -s "$f" ] || { echo "FATAL: expected artifact $f missing or empty" >&2; exit 1; }
  done
}

GUARD_RC=0

echo "=== [1/9] canon refresh (sf0.001, final binary) ==="
if [ "${GRAFT_SKIP_CANON:-0}" = "1" ]; then
  echo "skipped (GRAFT_SKIP_CANON=1 — canon already refreshed on this binary)"
else
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 GRAFT_BENCH_OUT=BENCH_CANON.json \
    sbt "runMain graft.Bench" 2>/dev/null | grep -m1 -o '"metric".*'
fi
require_nonempty BENCH_CANON.json

# Pre-warm gate (r17 ADVICE, medium): IndexWarm catches Throwable per
# query and emits "first_sec":-1 on failure, so "printed at least one
# line" alone lets a FAILED warm pass silently — and those queries'
# artifact builds then land inside the timed bench shards, exactly the
# contamination the warm step exists to prevent. Tee the output and
# fail the chain on any -1.
warm_gate() { # warm_gate <sfdir> <label>
  local out="/tmp/indexwarm_$2.txt"
  SPARK_GRAFT_SF_DIR="$1" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-8g}" \
    sbt "runMain graft.IndexWarm" 2>/dev/null | grep '{"query"' | tee "$out"
  [ -s "$out" ] || { echo "FATAL: $2 IndexWarm produced no output" >&2; exit 1; }
  if grep -q '"first_sec":-1' "$out"; then
    echo "FATAL: $2 IndexWarm had FAILING queries (first_sec -1 above) — their builds would land in timed shards" >&2
    exit 1
  fi
}

echo "=== [2/9] sf0.1 official artifact (final binary, full registry) ==="
# Pre-build index artifacts OUTSIDE the bench JVMs (r17: the one-time
# knn_pv_emb rebuild ran inside shard 3's JVM at sf1 and contaminated
# the two queries timed right after it, 7.6x hot — a fresh-named or
# fresh-schema artifact should never build inside a timed shard).
warm_gate /root/testdata/sf0.1 sf01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_OUT="BENCH_SELF_r${R}_sf01.json" \
  sbt "runMain graft.Bench" 2>/dev/null | grep -m1 -o '"metric".*'
require_nonempty "BENCH_SELF_r${R}_sf01.json"

echo "=== [3/9] sf0.1 guard vs the anchored baseline ==="
python3 tools/bench_guard.py "BENCH_SELF_r${R}_sf01.json" \
  | tee "BENCH_GUARD_r${R}.txt" || GUARD_RC=1
require_nonempty "BENCH_GUARD_r${R}.txt"

echo "=== [4/9] 10x full-registry bench ==="
warm_gate /tmp/graft_sf1 sf1
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 GRAFT_BENCH_OUT="BENCH_SELF_r${R}_sf1.json" \
  sbt "runMain graft.Bench" 2>/dev/null | grep -m1 -o '"metric".*'
require_nonempty "BENCH_SELF_r${R}_sf1.json"

echo "=== [5/9] sf1 guard vs the anchored sf1 baseline (r14 VERDICT task 5) ==="
python3 tools/bench_guard.py "BENCH_SELF_r${R}_sf1.json" \
  | tee "BENCH_GUARD_r${R}_sf1.txt" || GUARD_RC=1
require_nonempty "BENCH_GUARD_r${R}_sf1.txt"

echo "=== [6/9] 10x oracle compare (rationale-carrying excludes) ==="
# Warm the 10x fixture's index artifacts before the oracle leg too
# (r17 VERDICT task 6): step 4 normally covers this, but when the
# chain is resumed mid-way or an artifact was invalidated in between,
# Verify would otherwise build indexes lazily inside its own JVM —
# the same in-shard-build contamination, just in the correctness leg.
# Idempotent and cheap when step 4 already ran (adoption, no rebuild).
warm_gate /tmp/graft_sf1 sf1_oracle
rm -rf /tmp/vout_10x
SPARK_DRIVER_MEM=16g sbt "runMain graft.Verify /tmp/graft_sf1 /tmp/vout_10x" 2>&1 \
  | { grep -E "\[verify\].*failed" || true; }   # no failed lines is the good case
[ -s /tmp/vout_10x/oracle_sql.json ] || { echo "FATAL: Verify wrote no oracle_sql.json" >&2; exit 1; }
# a 10x mismatch is recorded loudly (ORACLE_RC) but does not abort the
# chain — the remaining stress/growth artifacts are still evidence
ORACLE_RC=0
GRAFT_ORACLE_TIMEOUT_S=300 \
GRAFT_ORACLE_JSON="CORRECTNESS_10x_r${R}.json" \
GRAFT_ORACLE_EXCLUDE="$EXCL" \
  python3 tools/check.py /tmp/graft_sf1 /tmp/vout_10x \
  > "CORRECTNESS_10x_r${R}.txt" 2>&1 || ORACLE_RC=1
tail -3 "CORRECTNESS_10x_r${R}.txt"
require_nonempty "CORRECTNESS_10x_r${R}.json" "CORRECTNESS_10x_r${R}.txt"

echo "=== [7/9] 100x full-registry stress, reps=1 ==="
rm -rf /tmp/vout_10x /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
df -h /tmp | tail -1
# Pre-build the persisted index artifacts with the build attributed in
# its OWN artifact (r16 VERDICT task 4): the reps=1 stress bench then
# measures steady-state query cost only, and SCALE100_BUILD records
# first-vs-steady per index-backed query (first >> steady = the build).
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_DRIVER_MEM=16g \
  sbt "runMain graft.IndexWarm" 2>/dev/null | grep -o '{"query".*' \
  | tee "SCALE100_BUILD_r${R}.txt"
require_nonempty "SCALE100_BUILD_r${R}.txt"
# same -1 gate as warm_gate, preserving the record file (r17 ADVICE)
if grep -q '"first_sec":-1' "SCALE100_BUILD_r${R}.txt"; then
  echo "FATAL: 100x IndexWarm had FAILING queries — builds would land in the stress bench" >&2
  exit 1
fi
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_BENCH_REPS=1 SPARK_DRIVER_MEM=16g \
  GRAFT_BENCH_OUT="SCALE100_r${R}.json" \
  sbt "runMain graft.Bench" 2>/dev/null | grep -m1 -o '"metric".*'
require_nonempty "SCALE100_r${R}.json"

echo "=== [8/9] growth reports ==="
python3 tools/scale_growth.py "BENCH_SELF_r${R}_sf1.json" "BENCH_SELF_r${R}_sf01.json" 10 \
  | tee "SCALE_GROWTH_r${R}.txt"
python3 tools/scale_growth.py "SCALE100_r${R}.json" "BENCH_SELF_r${R}_sf01.json" 100 \
  | tee "SCALE100_r${R}.txt"
require_nonempty "SCALE_GROWTH_r${R}.txt" "SCALE100_r${R}.txt"

echo "=== [9/9] git add the round records ==="
git add -- BENCH_CANON.json \
  "BENCH_SELF_r${R}_sf01.json" "BENCH_GUARD_r${R}.txt" \
  "BENCH_SELF_r${R}_sf1.json" "BENCH_GUARD_r${R}_sf1.txt" \
  "CORRECTNESS_10x_r${R}.json" "CORRECTNESS_10x_r${R}.txt" \
  "SCALE100_r${R}.json" "SCALE_GROWTH_r${R}.txt" "SCALE100_r${R}.txt" \
  "SCALE100_BUILD_r${R}.txt"
git status --short

RC=0
if [ "$ORACLE_RC" -ne 0 ]; then
  echo "DONE — but the 10x oracle compare FAILED queries (see CORRECTNESS_10x_r${R}.txt); fix before committing."
  RC=1
fi
if [ "$GUARD_RC" -ne 0 ]; then
  echo "DONE — but a bench guard FLAGGED regressions above; adjudicate before committing."
elif [ "$RC" -eq 0 ]; then
  echo "ALL DONE — 0 guard flags, 10x oracle clean; records staged."
fi
exit "$RC"
