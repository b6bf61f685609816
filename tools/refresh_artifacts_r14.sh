#!/bin/bash
# Round-14 artifact refresh: run everything sequentially on a quiet machine.
# Each step logs to /tmp/r14_refresh.log; failures don't stop later steps.
cd /root/repo
log=/tmp/r14_refresh.log
echo "=== refresh start $(date) ===" > $log

step() { echo "--- $1 $(date +%H:%M:%S) ---" >> $log; }

step correctness_sf001
python tools/check_correctness.py > CORRECTNESS_LOCAL_r14.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14.txt >> $log

step correctness_retry
# TENTH invariance axis (new, r14): real task failures + scheduler retries
# injected into every scan (local[N,4] + first-attempt faults on even
# partitions) — results must hash-MATCH the clean run.
SPARK_GRAFT_RETRY=1 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_retry.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_retry.txt >> $log

step correctness_aqe0
SPARK_GRAFT_AQE=0 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_aqe0.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_aqe0.txt >> $log

step plan_audit
python tools/plan_audit.py > /dev/null 2>&1
wc -l PLAN_AUDIT.txt >> $log
grep -c " ok " PLAN_AUDIT.txt >> $log 2>&1 || true

step scaling_suite
python tools/scaling_probe.py 1 4 16 >> $log 2>/dev/null

step bench_min3
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL_r14.json python bench.py >> $log 2>/dev/null
cp BENCH_LOCAL_r14.json BENCH_LOCAL_latest.json

step correctness_sf01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_sf01.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_sf01.txt >> $log

step correctness_sf0001
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_sf0001.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_sf0001.txt >> $log

step correctness_p7
SPARK_SHUFFLE_PARTITIONS=7 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_p7.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_p7.txt >> $log

step correctness_codegen0
SPARK_GRAFT_CODEGEN=0 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_codegen0.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_codegen0.txt >> $log

step correctness_split1mb
SPARK_GRAFT_SPLIT_MB=1 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_split1mb.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_split1mb.txt >> $log

step correctness_recovery
SPARK_GRAFT_STREAM_RECOVERY=1 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_recovery.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_recovery.txt >> $log

step correctness_spill
SPARK_GRAFT_SPILL=1 python tools/check_correctness.py > CORRECTNESS_LOCAL_r14_spill.txt 2>/dev/null
tail -1 CORRECTNESS_LOCAL_r14_spill.txt >> $log

step pytest
python -m pytest tests/ -q 2>&1 | tail -3 >> $log

echo "=== refresh done $(date) ===" >> $log
