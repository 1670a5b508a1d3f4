#!/bin/bash
# Round-9 measurement campaign at scale 1.0 (1e9 outer rows).
#
# seg1 — verdict item 2: cfg10 cold-auto PROFILING pass. cfg10 (inner
#   1e5, 1e6 uniform groups) benched 19.7 s = 2.60x the C's 7.57 s in
#   r8 with idle probes — the only >2x cell that is neither disk-bound
#   nor giant-groups. This run attributes it: per-stage task-time
#   (SPARK_GRAFT_STAGE_METRICS=1, max-vs-avg separates skew from
#   uniform cost) + the new per-rep TaskMetrics CSV columns (exact
#   shuffle/spill MB). Reference bar: q4112.csv cfg10 t16 = 7.57 s.
# seg2 — verdict item 1: the ROUTED layouts. cfg17 joined_bucketed and
#   cfg18+cfg10 bucketed now REGISTER the layout and hand part2Adaptive
#   the raw generator relations — the CSV plan column must read
#   joined_bucketed:joined_bucketed / bucketed:bucketed_routed, proving
#   the planner discovered the layout itself. Targets: auto-with-layout
#   <= 1.2x calibrated (C bars: cfg17 10.19 s, cfg18 10.73 s, cfg10
#   7.57 s).
cd /root/repo
log=/tmp/r9_campaign.log
echo "=== r9 seg1 cfg10 auto profiling $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9auto.csv 1.0 2 3 0 10" >> $log 2>&1
echo "=== r9 seg2a cfg17 joined_bucketed routed $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=joined_bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9jb.csv 1.0 2 3 0 17" >> $log 2>&1
echo "=== r9 seg2b cfg10,18 bucketed routed $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9bkt.csv 1.0 2 3 0 10,18" >> $log 2>&1
echo "=== R9_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
