#!/bin/bash
# Round-10 recovery campaign (sequential, single runner; the first
# attempt interleaved three JVMs after a concurrent-sbt clash killed
# seg1's launcher — see SCALING round-10 for which rows were kept):
#  seg4 — p2 cfg5,6,7,12,13,14 RE-RUN under the round-10 chooser
#  seg5 — p1 cfg1-8
cd /root/repo
log=/tmp/r10_campaign.log
echo "=== r10 seg4 p2 5,6,7,12,13,14 auto (band chooser) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r10auto2.csv 1.0 2 3 0 5,6,7,12,13,14" >> $log 2>&1
echo "=== r10 seg5 p1 cfg1-8 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r10auto.csv 1.0 1 2 0" >> $log 2>&1
echo "=== R10_RECOVERY_DONE $(date -u +%H:%M:%S)" >> $log
