#!/bin/bash
# Round-12 evidence chain (run AFTER sbt test + soak are green, with the
# machine otherwise idle — benches must never share the box with other
# Spark work). One shot, sequential, final binaries throughout.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32

echo "=== [1/5] sf0.001 canon refresh ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 GRAFT_BENCH_OUT=/tmp/bench_r12_canon.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true
cp /tmp/bench_r12_canon.json BENCH_CANON.json

echo "=== [2/5] sf0.1 official artifact ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_OUT=BENCH_SELF_r12_sf01.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [3/5] 10x full-registry bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 GRAFT_BENCH_OUT=BENCH_SELF_r12_sf1.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== [4/5] 10x oracle compare (VERDICT r11 task 3) ==="
sbt -warn "runMain graft.Verify /tmp/graft_sf1 /tmp/vout_10x" 2>&1 \
  | grep -E "\[verify\]" || true
GRAFT_ORACLE_TIMEOUT_S=300 \
GRAFT_ORACLE_JSON=CORRECTNESS_10x_r12.json \
GRAFT_ORACLE_EXCLUDE=dedup_incremental_simjoin,simjoin_prefix,cc_components,cc_clusters,cc_keep_best,dedup_apply_keep_best \
  python3 tools/check.py /tmp/graft_sf1 /tmp/vout_10x | tee /tmp/check_10x_r12.txt | tail -3

echo "=== [5/5] 100x full-registry stress, reps=1 (VERDICT r11 task 2) ==="
# Disk hygiene first: the r12a chain run hit ENOSPC mid-100x
# (best_match_fuzzy / embedding_near_dup_lsh shuffle spill vs ~10G of
# stale verify output + dead blockmgr dirs). Verify output is
# recreatable; stale Spark scratch dirs belong to dead JVMs.
rm -rf /tmp/vout_10x /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
df -h /tmp | tail -1
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_BENCH_REPS=1 SPARK_DRIVER_MEM=16g \
  GRAFT_BENCH_OUT=SCALE100_r12.json \
  sbt -warn "runMain graft.Bench" 2>/dev/null | grep metric || true

echo "=== guards ==="
python3 tools/bench_guard.py BENCH_SELF_r12_sf01.json | tee /tmp/guard_r12.txt || true
python3 tools/scale_growth.py BENCH_SELF_r12_sf1.json BENCH_SELF_r12_sf01.json 10 \
  | tee /tmp/growth10_r12.txt || true
python3 tools/scale_growth.py SCALE100_r12.json BENCH_SELF_r12_sf01.json 100 \
  | tee /tmp/growth100_r12.txt || true
echo "ALL DONE"
