#!/usr/bin/env python3
"""Round-10 matrix table: best clean rep per config vs the C t16 bars.

A rep is "clean" when its cpu probe < 0.8 s and shuffle probe < 2.5 s
(idle bands on this box: 0.25-0.5 / 1.0-1.7). Falls back to the best
rep with a * marker when no rep is clean. Later CSVs override earlier
ones for the same config (re-runs under a newer chooser win).
"""
import csv, sys

C_P2 = [1.24, 4.38, 6.96, 7.61, 5.49, 2.87, 4.54, 1.76, 4.68, 7.57,
        8.17, 6.00, 3.04, 4.92, 5.04, 7.14, 10.19, 10.73, 8.60, 6.38, 7.43]
C_P1 = [0.88, 0.49, 1.37, 0.85, 4.34, 3.70, 4.13, 3.70]  # q4112_hj.csv t16

SHAPES_P2 = [(100,100,0,0.0),(100,10000,0,0.0),(100,1000000,0,0.0),
    (100,100000000,0,0.0),(100,100000000,100,0.5),(100,100000000,100,1.0),
    (100,100000000,10000,1.0),(100000,100,0,0.0),(100000,10000,0,0.0),
    (100000,1000000,0,0.0),(100000,100000000,0,0.0),(100000,100000000,100,0.5),
    (100000,100000000,100,1.0),(100000,100000000,10000,1.0),
    (100000000,100,0,0.0),(100000000,10000,0,0.0),(100000000,1000000,0,0.0),
    (100000000,100000000,0,0.0),(100000000,100000000,100,0.5),
    (100000000,100000000,100,1.0),(100000000,100000000,10000,1.0)]
# part-1: (inner, isel, osel) in matrix order
SHAPES_P1 = [(100,1.0,0.5),(100,1.0,1.0),(100000,1.0,0.5),(100000,1.0,1.0),
    (100000000,0.5,0.5),(100000000,0.5,1.0),(100000000,1.0,0.5),(100000000,1.0,1.0)]

def load(files, part):
    rows = {}
    for f in files:
        try:
            rdr = csv.reader(open(f))
        except OSError:
            continue
        for r in rdr:
            if len(r) < 15: continue
            inner, isel = int(r[0]), float(r[1])
            osel, groups, hh, hhp = float(r[4]), int(r[6]), int(r[7]), float(r[8])
            key = (inner, groups, hh, hhp) if part == 2 else (inner, isel, osel)
            sec, plan = int(r[11]) / 1e9, r[12]
            calib, csh = float(r[13]), float(r[14])
            clean = calib < 0.8 and csh < 2.5
            rows.setdefault((f, key), []).append((sec, plan, clean, calib, csh))
    # last file wins per key
    best = {}
    for (f, key), reps in rows.items():
        best[key] = (f, reps)
    return best

def emit(part, shapes, bars, files):
    data = load(files, part)
    ratios = []
    for i, (shape, bar) in enumerate(zip(shapes, bars), 1):
        if shape not in data:
            print(f"| {i} | {shape} | MISSING |")
            continue
        f, reps = data[shape]
        clean = [r for r in reps if r[2]]
        pick = min(clean or reps, key=lambda r: r[0])
        star = "" if clean else "*"
        ratio = pick[0] / bar
        ratios.append(ratio)
        print(f"| {i} | {pick[1]} | {pick[0]:.2f}{star} | {pick[3]:.2f}/{pick[4]:.2f} | {bar:.2f} | {ratio:.2f}x |")
    ratios.sort()
    n = len(ratios)
    med = ratios[n//2] if n % 2 else (ratios[n//2-1]+ratios[n//2])/2
    print(f"cells={n} median={med:.2f}x  <2x: {sum(1 for r in ratios if r < 2.0)}/{n}")

if __name__ == "__main__":
    print("== part 2 ==")
    emit(2, SHAPES_P2, C_P2,
         ["matrix_results_1e0_p2_r10auto.csv", "matrix_results_1e0_p2_r10auto2.csv",
          "matrix_results_1e0_p2_r10narrow.csv"])
    print("== part 1 ==")
    emit(1, SHAPES_P1, C_P1,
         ["matrix_results_1e0_p1_r10auto.csv", "matrix_results_1e0_p1_r10narrow.csv"])
