#!/bin/bash
# Round-14 evidence chain (VERDICT r13 tasks 2 + 4): run AFTER sbt test
# is green, machine otherwise idle — benches never share the box with
# other Spark work. Sequential, final binaries throughout.
#
# Canon refresh (sf0.001) and TESTRUN_r14.txt are produced separately
# before this script; steps here are the scale evidence.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32

echo "=== [1/6] sf0.1 official artifact ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_OUT=BENCH_SELF_r14_sf01.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [2/6] guard adjudication vs the r12 clean artifact ==="
python3 tools/bench_guard.py BENCH_SELF_r14_sf01.json | tee BENCH_GUARD_r14.txt || true

echo "=== [3/6] kNN graph 10x/100x probe at the SHIPPED operating point ==="
GRAFT_KNN_OCC=32 GRAFT_KNN_CAP=1024 \
  sbt -warn "Test/runMain graft.KnnProbe /tmp/graft_sf1 /tmp/graft_sf10" \
  2>/dev/null | tee KNN100_r14.txt || true

echo "=== [4/6] 10x full-registry bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 GRAFT_BENCH_OUT=BENCH_SELF_r14_sf1.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [5/6] 10x oracle compare ==="
rm -rf /tmp/vout_10x
sbt -warn "runMain graft.Verify /tmp/graft_sf1 /tmp/vout_10x" 2>&1 \
  | grep -E "\[verify\]" || true
GRAFT_ORACLE_TIMEOUT_S=300 \
GRAFT_ORACLE_JSON=CORRECTNESS_10x_r14.json \
GRAFT_ORACLE_EXCLUDE=dedup_incremental_simjoin,simjoin_prefix \
  python3 tools/check.py /tmp/graft_sf1 /tmp/vout_10x \
  | tee CORRECTNESS_10x_r14.txt | tail -3

echo "=== [6/6] 100x full-registry stress, reps=1 ==="
rm -rf /tmp/vout_10x /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
df -h /tmp | tail -1
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_BENCH_REPS=1 SPARK_DRIVER_MEM=16g \
  GRAFT_BENCH_OUT=SCALE100_r14.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== growth reports ==="
python3 tools/scale_growth.py BENCH_SELF_r14_sf1.json BENCH_SELF_r14_sf01.json 10 \
  | tee SCALE_GROWTH_r14.txt || true
python3 tools/scale_growth.py SCALE100_r14.json BENCH_SELF_r14_sf01.json 100 \
  | tee SCALE100_r14.txt || true
echo "ALL DONE"
