#!/bin/bash
# Round-10 measurement campaign at scale 1.0 (1e9 outer rows).
#
# Goal (round-9 verdict items 2+3): a FULL 29-cell refresh — all 8
# part-1 + 21 part-2 configs — under the round-10 planner (layout
# routing + partial_dense + the new shared_dense CAS table), one
# session family, plan label + clean probes per cell, new cold-auto
# median. Reference bars: BASELINE.md q4112_hj.csv / q4112.csv t16.
#
# seg0 — cfg18 first (the round-9 weak cell): auto must now route
#   shared_dense (1e8 singleton groups, local JVM) — the reference's
#   own t16 algorithm. Pre-fix: 65.9 s = 6.1x the C's 10.73 s,
#   9.6 GB shuffle + 14 GB spill per rep. Target: <2x, 0 MB shuffle.
# seg1 — part-2 cfg1-14 cold auto (fast gen: inner <= 1e5).
# seg2 — part-2 cfg15-17,19-21 cold auto (inner=1e8, heavy gen).
# seg3 — part-1 cfg1-8 cold auto.
cd /root/repo
log=/tmp/r10_campaign.log
echo "=== r10 seg0 cfg18 auto (shared_dense expected) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r10auto.csv 1.0 2 3 0 18" >> $log 2>&1
echo "=== r10 seg1 p2 cfg1-14 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r10auto.csv 1.0 2 3 0 1,2,3,4,5,6,7,8,9,10,11,12,13,14" >> $log 2>&1
echo "=== r10 seg2 p2 cfg15-21 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r10auto.csv 1.0 2 3 0 15,16,17,19,20,21" >> $log 2>&1
echo "=== r10 seg3 p1 cfg1-8 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r10auto.csv 1.0 1 3 0" >> $log 2>&1
echo "=== R10_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
