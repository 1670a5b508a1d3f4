#!/bin/bash
# Round-5 measurement campaign at scale 1.0 (1e9 outer rows).
#
# seg1 — verdict item 5: cfg18-21 bucketed, reps=3. Round 4 measured the
#   per-rep dense broadcast build at 17.9 s of cfg18's 28.6 s best rep;
#   the relation-keyed dense cache (round-5 commit 0cfc1d9) builds it
#   once per config, so reps 2-3 measure the steady state a production
#   session sees. Target: cfg18-21 <= 2x the reference.
# seg2 — verdict item 4: the four unexplained >2x shapes cfg8/10/15/17,
#   auto plan, reps=3, stage metrics on for attribution (skew vs uniform
#   per-row cost). cfg15/17 also benefit from the dense cache (inner=1e8);
#   cfg8/10 from the sample cache (~1-3 s was paid inside every timed rep).
# seg3 — verdict item 6 attribution: cfg6 bucketed (hh=100 hhp=1.0), the
#   bucket-skew shape, stage metrics on — decide whether the 3.0x is task
#   imbalance (max >> avg) or per-row aggregate-map cost before coding the
#   hybrid fallback.
cd /root/repo
log=/tmp/r5_campaign.log
echo "=== seg1 part-2 cfg18-21 bucketed dense-cached $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r5bkt.csv 1.0 2 3 0 18,19,20,21" >> $log 2>&1
echo "=== seg2 part-2 cfg8,10,15,17 auto attribution $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r5auto.csv 1.0 2 3 0 8,10,15,17" >> $log 2>&1
echo "=== seg3 part-2 cfg6 bucketed skew attribution $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r5bkt.csv 1.0 2 3 0 6" >> $log 2>&1
echo "=== CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
