#!/bin/bash
# Round-5 campaign, segment 6 (run after tools/r5_campaign_seg45.sh).
#
# cfg3 (inner=100, groups=1e6) is the last unmeasured member of the
# mid-cardinality band that seg2 attributed to UNIFORM partial-agg map
# pressure (32 private ~865k-entry DRAM maps vs the reference's one
# L3-resident shared table): best-known 14.1 s vs ref t16 6.96 s =
# 2.03x, an old unlabeled r2 row. Same treatment as cfg10/17: the
# bucketed layout gives per-bucket maps of ~4k entries, exchange-free.
cd /root/repo
log=/tmp/r5_campaign.log
echo "=== seg6 part-2 cfg3 bucketed (mid-card band) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r5bkt.csv 1.0 2 2 0 3" >> $log 2>&1
echo "=== SEG6_DONE $(date -u +%H:%M:%S)" >> $log
