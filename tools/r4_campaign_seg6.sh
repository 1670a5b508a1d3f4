#!/bin/bash
# Round-4 campaign, segment 6: clean re-run of part-1 cfg5 bucketed.
# seg2 measured cfg5 at 66-88 s — an order off its cfg6/7/8 neighbors
# (4.0-7.3 s) — but cfg5 ran FIRST after seg1's OOM-kill, and the
# items_bkt writes in that window were 4-8x slower than identical later
# writes (24/55 s vs 6.6/7.0 s for byte-identical 1e8-row tables), so
# the box was still paging/writing back. Re-measure on an idle box.
# Also validates the round-4 part1Adaptive layout detection at 1e9:
# the CSV plan column must read "bucketed:bucketed-shj" (detected),
# not a forced plan.
cd /root/repo
log=/tmp/r4_campaign.log
echo "=== seg6 part-1 cfg5 bucketed clean re-run $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P1_PLAN=bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r4bkt.csv 1.0 1 3 0 5" >> $log 2>&1
echo "=== SEG6_DONE $(date -u +%H:%M:%S)" >> $log
