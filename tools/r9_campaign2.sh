#!/bin/bash
# Round-9 follow-up campaign at scale 1.0 (1e9 outer rows).
#
# seg3 — the round's tuning result: cfg10/17/18 cold AUTO now route the
#   partial-aggregation family to the DENSE-ARRAY partial aggregate
#   (Q4112.part2DenseAgg — per-task long[domain] accumulators instead
#   of the ~1e6-entry hash map the r9 profile showed dominating one
#   uniform CPU-bound stage at ~430 ns/row). Expected plan label:
#   auto:partial_dense. Reference bars (q4112.csv t16): cfg10 7.57 s,
#   cfg17 10.19 s, cfg18 10.73 s.
# seg4 — clean re-read of cfg17 joined_bucketed ROUTED: the first r9
#   run measured all three reps under the materialization write's
#   writeback tail (shuffle probes 5-6x idle); Matrix now settles
#   until the shuffle probe returns to its idle band before rep 1.
#   r8 steady-state bar: 1.63 s (0.16x the C).
cd /root/repo
log=/tmp/r9_campaign2.log
echo "=== r9 seg3 cfg10,17,18 auto partial_dense $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9dense.csv 1.0 2 3 0 10,17,18" >> $log 2>&1
echo "=== r9 seg4 cfg17 joined_bucketed routed, settled $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=joined_bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9jb2.csv 1.0 2 3 0 17" >> $log 2>&1
echo "=== R9_CAMPAIGN2_DONE $(date -u +%H:%M:%S)" >> $log
