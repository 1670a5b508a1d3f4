#!/bin/bash
# Round-10 campaign, part 2 (replaces the auto-chained seg2/seg3 after
# seg1 exposed the hhp family): one part-2 invocation covering
#  - cfg5/6/7/12/13/14 RE-RUN under the round-10 chooser (seg1 measured
#    them under the pre-band-route classes: partial hash at 4.6-10.5x
#    the C with up to 50 GB spill; the 2^22..2^27 band now routes the
#    shared CAS table + per-task combine cache),
#  - cfg15-17 and 19-21 first-run (cfg18 was seg0).
# Then part-1 cfg1-8.
cd /root/repo
log=/tmp/r10_campaign.log
echo "=== r10 seg2' p2 5,6,7,12-17,19-21 auto (band chooser) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r10auto.csv 1.0 2 3 0 5,6,7,12,13,14,15,16,17,19,20,21" >> $log 2>&1
echo "=== r10 seg3 p1 cfg1-8 auto $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r10auto.csv 1.0 1 2 0" >> $log 2>&1
echo "=== R10_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
