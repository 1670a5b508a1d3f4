#!/bin/bash
# Round-11 measurement campaign at scale 1.0 (1e9 outer rows).
#
# Goals (round-10 verdict items 3 + 7):
#  segA — part-1 engine floor: scan_floor mode (pure columnar scan +
#    ungrouped agg over the SAME cached orders relation — no join, no
#    dense build) on cfg1/cfg2's shape, next to a same-session auto
#    re-run whose stderr carries the [dense-build] job time. Together
#    they decompose cfg2's 1.15 s / 2.34x into (engine scan floor) +
#    (lookup cost) + (build-job dispatch) — measured, not asserted.
#  segB-D — combine-cache size ablation mirroring the reference's own
#    extra/ study (README-2.txt:10-12 measured 2^10/2^13/2^15):
#    SPARK_GRAFT_CACHE_BITS in {13, 10, 15} over the three shared_dense
#    poles: cfg6 (100 hh groups, hhp=1.0 — cache-resident head),
#    cfg7 (1e4 hh groups — cache-capacity boundary at 2^13), and
#    cfg18 (1e8 singleton groups — every access evicts; the cache is
#    pure overhead). 3 reps each, best-of quoted; 13 re-measured in
#    the same session family so the A/B is weather-fair.
#
# Single sequential runner — NEVER launch a second sbt against this
# repo while this runs (round-10 lesson: a concurrent launcher clash
# orphans the forked JVM and cascades into overlapping 100 GB sessions).
cd /root/repo
log=/tmp/r11_campaign.log
echo "=== r11 segA1 p1 scan_floor cfg1,2 $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P1_PLAN=scan_floor \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r11floor.csv 1.0 1 3 0 1,2" >> $log 2>&1
echo "=== r11 segA2 p1 auto cfg1,2 (dense-build stderr) $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p1_r11auto.csv 1.0 1 3 0 1,2" >> $log 2>&1
echo "=== r11 segB p2 cacheBits=13 cfg6,7,18 $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto SPARK_GRAFT_CACHE_BITS=13 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r11cb13.csv 1.0 2 3 0 6,7,18" >> $log 2>&1
echo "=== r11 segC p2 cacheBits=10 cfg6,7,18 $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto SPARK_GRAFT_CACHE_BITS=10 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r11cb10.csv 1.0 2 3 0 6,7,18" >> $log 2>&1
echo "=== r11 segD p2 cacheBits=15 cfg6,7,18 $(date -u +%H:%M:%S)" >> $log
SPARK_DRIVER_MEM=100g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_P2_PLAN=auto SPARK_GRAFT_CACHE_BITS=15 \
  sbt -batch "runMain graft.Matrix matrix_results_1e0_p2_r11cb15.csv 1.0 2 3 0 6,7,18" >> $log 2>&1
echo "=== R11_CAMPAIGN_DONE $(date -u +%H:%M:%S)" >> $log
