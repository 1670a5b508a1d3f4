#!/bin/bash
# Round-8 measurement campaign at scale 1.0 (1e9 outer rows).
#
# seg1 — verdict item 1: cfg 1, 10, 17, 18 (part-2), auto plan, reps=3,
#   under the NEW harness: per-rep in-session calibration column (the
#   same fixed-work spin Bench runs; idle ≈ 0.41-0.77 s) and per-rep
#   double-GC + cleaner-settle hygiene. Targets: cfg17's 3-rep spread
#   ≤ 1.5× (r7 measured 33.5/27.8/178 — the rep-3 GC collapse), and
#   calib-normalized ratios comparable across sessions for the first
#   time. Reference bars (q4112.csv t16): cfg1 1.24 s, cfg10 2.58 s,
#   cfg17 10.19 s, cfg18 10.73 s.
# seg2 — same-session cfg17 joined_bucketed regression guard: the
#   promoted ≤2× product surface (0.42×-0.94× across r6/r7 sessions),
#   now with the write-phase cache release (Matrix frees the generator
#   caches + dense broadcast once the oracle is computed) and the calib
#   column to normalize against seg1.
cd /root/repo
log=/tmp/r8_campaign.log
echo "=== r8 seg1 part-2 cfg1,10,17,18 auto calib $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r8auto.csv 1.0 2 3 0 1,10,17,18" >> $log 2>&1
echo "=== r8 seg2 cfg17 joined_bucketed regression $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=joined_bucketed \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r8jb.csv 1.0 2 3 0 17" >> $log 2>&1
echo "=== R8_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
