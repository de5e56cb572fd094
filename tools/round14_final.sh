#!/bin/bash
# Round-14 FINAL-binary evidence chain: canon + official sf0.1 + guard +
# 10x bench + 10x oracle + 100x stress + growth reports. Sequential —
# benches never share the box. Run only when otherwise idle.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32

echo "=== [1/7] canon refresh (sf0.001, final binary) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 GRAFT_BENCH_OUT=BENCH_CANON.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [2/7] sf0.1 official artifact (final binary, 225 queries) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_OUT=BENCH_SELF_r14_sf01.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [3/7] guard adjudication vs the r12 clean artifact ==="
python3 tools/bench_guard.py BENCH_SELF_r14_sf01.json | tee BENCH_GUARD_r14_final.txt || true

echo "=== [4/7] 10x full-registry bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 GRAFT_BENCH_OUT=BENCH_SELF_r14_sf1.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [5/7] 10x oracle compare ==="
rm -rf /tmp/vout_10x
SPARK_DRIVER_MEM=16g sbt -warn "runMain graft.Verify /tmp/graft_sf1 /tmp/vout_10x" 2>&1 \
  | grep -E "\[verify\].*failed" || true
GRAFT_ORACLE_TIMEOUT_S=300 \
GRAFT_ORACLE_JSON=CORRECTNESS_10x_r14.json \
GRAFT_ORACLE_EXCLUDE=dedup_incremental_simjoin,simjoin_prefix \
  python3 tools/check.py /tmp/graft_sf1 /tmp/vout_10x \
  | tee CORRECTNESS_10x_r14.txt | tail -3

echo "=== [6/7] 100x full-registry stress, reps=1 ==="
rm -rf /tmp/vout_10x /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
df -h /tmp | tail -1
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_BENCH_REPS=1 SPARK_DRIVER_MEM=16g \
  GRAFT_BENCH_OUT=SCALE100_r14.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [7/7] growth reports ==="
python3 tools/scale_growth.py BENCH_SELF_r14_sf1.json BENCH_SELF_r14_sf01.json 10 \
  | tee SCALE_GROWTH_r14.txt || true
python3 tools/scale_growth.py SCALE100_r14.json BENCH_SELF_r14_sf01.json 100 \
  | tee SCALE100_r14.txt || true
echo "ALL DONE"
