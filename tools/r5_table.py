#!/usr/bin/env python3
"""Consolidated best-known-vs-reference table for README/SCALING.

Merges every matrix_results_1e0_p{1,2}*.csv row (best-of-reps per
config) against the reference's published t16 numbers (BASELINE.md) and
prints one markdown table per part with ratios + the overall median.

Usage: python3 tools/r5_table.py
"""
import csv
import glob
import statistics

# (inner, isel, osel) -> (cfg#, ref_t16_sec)  [BASELINE.md part 1]
P1_REF = {
    (100, 1.0, 0.5): (1, 0.88),
    (100, 1.0, 1.0): (2, 0.49),
    (100000, 1.0, 0.5): (3, 1.37),
    (100000, 1.0, 1.0): (4, 0.85),
    (100000000, 0.5, 0.5): (5, 4.34),
    (100000000, 0.5, 1.0): (6, 3.70),
    (100000000, 1.0, 0.5): (7, 4.13),
    (100000000, 1.0, 1.0): (8, 3.70),
}

# (inner, groups, hh, hhp) -> (cfg#, ref_t16_sec)  [BASELINE.md part 2]
P2_REF = {
    (100, 100, 0, 0.0): (1, 1.24),
    (100, 10000, 0, 0.0): (2, 4.38),
    (100, 1000000, 0, 0.0): (3, 6.96),
    (100, 100000000, 0, 0.0): (4, 7.61),
    (100, 100000000, 100, 0.5): (5, 5.49),
    (100, 100000000, 100, 1.0): (6, 2.87),
    (100, 100000000, 10000, 1.0): (7, 4.54),
    (100000, 100, 0, 0.0): (8, 1.76),
    (100000, 10000, 0, 0.0): (9, 4.68),
    (100000, 1000000, 0, 0.0): (10, 7.57),
    (100000, 100000000, 0, 0.0): (11, 8.17),
    (100000, 100000000, 100, 0.5): (12, 6.00),
    (100000, 100000000, 100, 1.0): (13, 3.04),
    (100000, 100000000, 10000, 1.0): (14, 4.92),
    (100000000, 100, 0, 0.0): (15, 5.04),
    (100000000, 10000, 0, 0.0): (16, 7.14),
    (100000000, 1000000, 0, 0.0): (17, 10.19),
    (100000000, 100000000, 0, 0.0): (18, 10.73),
    (100000000, 100000000, 100, 0.5): (19, 8.60),
    (100000000, 100000000, 100, 1.0): (20, 6.38),
    (100000000, 100000000, 10000, 1.0): (21, 7.43),
}


def best_rows(paths):
    best = {}
    for path in paths:
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) < 12 or int(row[3]) != 1000000000:
                    continue
                key = (int(row[0]), float(row[1]), float(row[4]),
                       int(row[6]), int(row[7]), float(row[8]))
                ns = int(row[11])
                plan = row[12] if len(row) > 12 else "?"
                if key not in best or ns < best[key][0]:
                    best[key] = (ns, plan)
    return best


def emit(title, ref, best, keyfn):
    print(f"### {title}\n")
    print("| cfg | config | best (s) | plan | ref t16 (s) | ratio |")
    print("|---|---|---|---|---|---|")
    ratios = []
    for refkey, (cfg, t16) in sorted(ref.items(), key=lambda kv: kv[1][0]):
        match = [(ns, plan) for k, (ns, plan) in best.items()
                 if keyfn(k) == refkey]
        if not match:
            print(f"| {cfg} | {refkey} | — | — | {t16:.2f} | — |")
            continue
        ns, plan = min(match)
        sec = ns / 1e9
        ratios.append(sec / t16)
        print(f"| {cfg} | {refkey} | {sec:.2f} | {plan} | {t16:.2f} | "
              f"{sec / t16:.2f}x |")
    if ratios:
        print(f"\nmedian {statistics.median(ratios):.2f}x, "
              f"max {max(ratios):.2f}x over {len(ratios)} configs\n")
    return ratios


def main():
    p1 = best_rows(glob.glob("matrix_results_1e0_p1*.csv"))
    p2 = best_rows(glob.glob("matrix_results_1e0_p2*.csv"))
    r1 = emit("Part 1 (join + ungrouped AVG)", P1_REF, p1,
              lambda k: (k[0], k[1], k[2]))
    r2 = emit("Part 2 (join + grouped AVG + avg-of-avgs)", P2_REF, p2,
              lambda k: (k[0], k[3], k[4], k[5]))
    allr = r1 + r2
    print(f"ALL: median {statistics.median(allr):.2f}x, "
          f"max {max(allr):.2f}x, n={len(allr)}, "
          f"<=2x: {sum(1 for r in allr if r <= 2.0)}/{len(allr)}, "
          f"beats C: {sum(1 for r in allr if r < 1.0)}")


if __name__ == "__main__":
    main()
