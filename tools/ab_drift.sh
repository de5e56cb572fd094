#!/bin/bash
# r17 VERDICT task 2: attribute the diffuse sf0.1 bench drift
# (r16→r17 clean-median totals +8.7% with ZERO per-query guard flags)
# before any re-anchor bakes it in. Protocol: the r16 and r17 FINAL
# binaries (worktrees at their round-close commits, compiled once)
# run the identical full-registry bench at sf0.1, INTERLEAVED
# A B A B A B (3 sessions each) in one otherwise-idle box session, so
# slow environment drift (thermal, page cache, background daemons)
# hits both arms equally. Each Bench invocation is itself the sharded
# fresh-JVM × 3-reps-median protocol, so an arm's session total is
# already noise-suppressed; 3 interleaved sessions per arm give a
# median-of-medians per query.
#
#   tools/ab_drift.sh [sfdir]        default /root/testdata/sf0.1
#
# Outputs /tmp/ab_out/{r16,r17}_run{1,2,3}.json; analyze with
# tools/ab_drift_report.py.
set -euo pipefail
SF="${1:-/root/testdata/sf0.1}"
OUT=/tmp/ab_out
mkdir -p "$OUT"
export SPARK_GRAFT_CPUS=32

# Pre-warm each arm's index artifacts in its own warehouse (each
# worktree has its own ./spark-warehouse), OUTSIDE the timed runs —
# the r17 adjudication lesson: an in-session artifact build poisons
# the queries sharing that shard's JVM. r16's binary predates
# IndexWarm? It exists since r17 only in name — fall back to one
# untimed full bench as the warm when IndexWarm is absent.
warm() { # warm <worktree> <label>
  local wt="$1" label="$2"
  if [ -e "$wt/src/main/scala/graft/IndexWarm.scala" ]; then
    (cd "$wt" && SPARK_GRAFT_SF_DIR="$SF" sbt "runMain graft.IndexWarm" 2>/dev/null \
      | grep -c '{"query"') || { echo "FATAL: $label warm failed" >&2; exit 1; }
  else
    (cd "$wt" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_REPS=1 \
      GRAFT_BENCH_OUT="$OUT/${label}_warm.json" sbt "runMain graft.Bench" 2>/dev/null \
      | grep -m1 -c '"metric"') || { echo "FATAL: $label warm bench failed" >&2; exit 1; }
  fi
}

run() { # run <worktree> <label> <i>
  local wt="$1" label="$2" i="$3"
  echo "=== $label run $i ($(date +%H:%M:%S)) ==="
  (cd "$wt" && SPARK_GRAFT_SF_DIR="$SF" GRAFT_BENCH_OUT="$OUT/${label}_run${i}.json" \
    sbt "runMain graft.Bench" 2>/dev/null | grep -m1 -o '"metric".*' | head -c 120)
  echo
  [ -s "$OUT/${label}_run${i}.json" ] || { echo "FATAL: $label run $i wrote nothing" >&2; exit 1; }
}

echo "=== warm r16 ==="; warm /tmp/ab_r16 r16
echo "=== warm r17 ==="; warm /tmp/ab_r17 r17
for i in 1 2 3; do
  run /tmp/ab_r16 r16 "$i"
  run /tmp/ab_r17 r17 "$i"
done
echo "AB DONE — analyze: python3 tools/ab_drift_report.py"
