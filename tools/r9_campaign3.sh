#!/bin/bash
# Round-9 third campaign: cold-auto sweep of the remaining bounded-
# group-domain part-2 configs now that the partial family routes to the
# dense-array aggregate (partial_dense). C bars (q4112.csv t16):
# cfg2 4.38, cfg3 6.96, cfg9 4.68, cfg15 5.04, cfg16 7.14.
cd /root/repo
log=/tmp/r9_campaign3b.log
echo "=== r9 seg5 cfg2,3,9,15,16 auto dense sweep $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r9sweep.csv 1.0 2 3 0 2,3,9,15,16" >> $log 2>&1
echo "=== R9_CAMPAIGN3_DONE $(date -u +%H:%M:%S)" >> $log
