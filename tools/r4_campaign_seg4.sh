#!/bin/bash
# Round-4 campaign, segment 4 (recovery): part-2 bucketed configs that
# seg1 lost — 18,19,20,21 (JVM OOM-killed when cfg18's 1e8-row inner
# generation started while other JVMs held memory) — plus a redo of
# cfg13, whose two seg1 reps (21.5/26.1 s vs ~9 s neighbors) were
# polluted by concurrent verification runs. Run on an otherwise idle box.
cd /root/repo
log=/tmp/r4_campaign.log
echo "=== seg4 part-2 bucketed recovery $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r4bkt.csv 1.0 2 2 0 13,18,19,20,21" >> $log 2>&1
echo "=== SEG4_DONE $(date -u +%H:%M:%S)" >> $log
echo "=== seg5 auto cfg4,6 re-run (fixed sampler) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r4auto2.csv 1.0 2 2 0 4,6" >> $log 2>&1
echo "=== SEG5_DONE $(date -u +%H:%M:%S)" >> $log
