#!/bin/bash
# Round-4 measurement campaign at scale 1.0 (1e9 outer rows).
cd /root/repo
log=/tmp/r4_campaign.log
echo "=== seg1 part-2 bucketed $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r4bkt.csv 1.0 2 2 0 5,6,7,11,12,13,14,18,19,20,21" >> $log 2>&1
echo "=== seg2 part-1 bucketed $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P1_PLAN=bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r4bkt.csv 1.0 1 2 0 5,6,7,8" >> $log 2>&1
echo "=== seg3 auto confirm cfg4,6 $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r4auto.csv 1.0 2 2 0 4,6" >> $log 2>&1
echo "=== CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
