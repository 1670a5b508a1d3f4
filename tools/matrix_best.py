#!/usr/bin/env python3
"""Best-of-reps summary for matrix_results CSVs (12-15 column rows;
col 13 = plan label (round 3), cols 14-15 = cpu/shuffle calibration
probes (round 8) — all reads are positional on the first 13)."""
import csv
import sys
from collections import defaultdict

best = defaultdict(lambda: (float("inf"), ""))
for path in sys.argv[1:]:
    with open(path) as f:
        for row in csv.reader(f):
            if len(row) < 12:
                continue
            key = tuple(row[:9])
            ns = int(row[11])
            plan = row[12] if len(row) > 12 else "?"
            if ns < best[key][0]:
                best[key] = (ns, plan)
for key, (ns, plan) in sorted(best.items(), key=lambda kv: (int(kv[0][0]), int(kv[0][6]), kv[0][7], kv[0][8])):
    inner, _, _, outer, osel, _, groups, hh, hhp = key
    print(f"inner={inner:>11} outer={outer} osel={osel} groups={groups:>11} "
          f"hh={hh:>8} hhp={hhp} best={ns/1e9:8.3f}s plan={plan}")
