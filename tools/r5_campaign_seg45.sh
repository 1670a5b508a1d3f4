#!/bin/bash
# Round-5 campaign, segments 4-5 (run after tools/r5_campaign.sh).
#
# seg4 — verdict item 4 closure: cfg10/cfg17 (groups=1e6, the
#   mid-cardinality band) attributed by seg2 stage metrics as UNIFORM
#   partial-agg map cost: each of 32 tasks builds its own ~865k-entry
#   aggregation map (DRAM-resident) where the reference uses one shared
#   16 MB CAS table that fits L3. The scale-safe answer is the same as
#   for the 1e8-group shapes: the bucketed layout — per-bucket maps of
#   ~4k entries, exchange-free. Measure it.
# seg5 — part-1 cfg2 (inner=100, 1.79x) and cfg4 (inner=1e5, 2.04x)
#   under the round-5 planner, which now picks the dense perfect-hash
#   probe for any contiguous-key build side (was: broadcast hash-map
#   probe for inner <= 1e7).
# seg4 also re-runs cfg13 (1e5/1e8/hh=100/hhp=1.0, last 2.1x shape):
#   its r4 bucketed rep rode the broadcast hash-map probe that cost
#   cfg6 ~5 s/1e9 rows — the dense-eligible planner should remove it.
cd /root/repo
log=/tmp/r5_campaign.log
echo "=== seg4 part-2 cfg10,17 bucketed (mid-card band) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=bucketed SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r5bkt.csv 1.0 2 2 0 10,13,17" >> $log 2>&1
echo "=== seg5 part-1 cfg2,4 auto (dense-eligible planner) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_STAGE_METRICS=1 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r5dense.csv 1.0 1 3 0 2,4" >> $log 2>&1
echo "=== SEG45_DONE $(date -u +%H:%M:%S)" >> $log
