#!/bin/bash
# Round-11 full-matrix refresh at scale 1.0 (1e9 outer rows).
#
# Why: the round-11 eager single-runJob shared_dense form (leak fix)
# measured substantially faster on the ablation poles than the r10
# lazy form (cfg18 1.37x -> 1.02x, cfg7 0.83x -> 0.62x, cfg6
# 1.21x -> 0.88x, same chooser, clean probes). Re-measure the whole
# 29-cell matrix under the current code so the quoted medians are the
# code's, not last round's. Protocol identical to r10: cold auto,
# stats-routed plans over raw relations, 3 reps, best clean rep
# quoted, per-part width defaults (narrow p1 / wide p2).
#
# Single sequential runner — no other sbt against this repo while
# this runs.
cd /root/repo
log=/tmp/r11_campaign2.log
echo "=== r11f seg1 p1 cfg1-8 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r11full.csv 1.0 1 3 0" >> $log 2>&1
echo "=== r11f seg2 p2 cfg1-14 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r11full.csv 1.0 2 3 0 1,2,3,4,5,6,7,8,9,10,11,12,13,14" >> $log 2>&1
echo "=== r11f seg3 p2 cfg15-21 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r11full.csv 1.0 2 3 0 15,16,17,18,19,20,21" >> $log 2>&1
echo "=== R11F_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
