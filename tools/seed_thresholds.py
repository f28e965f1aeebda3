#!/usr/bin/env python3
"""Seed/tighten tools/bench_thresholds.json from the guard's median file.

Run AFTER a full `check.py --bench` (which writes bench_medians.json).
Discipline: limit = max(median * 1.5, median + 1.2s); TIGHTEN-ONLY for
existing entries (a noisy slow run must never loosen a ceiling), seed
for queries with no entry yet. Prints every change so the round log
records exactly what moved.

The +1.2 s additive term is the measured JIT compile-placement noise on
the 285-query surface (r13_guard_inflation.md): ~260 s of background
compilation per run lands on arbitrary queries in ~1 s bites, so a
purely multiplicative margin makes every sub-second ceiling a coin
flip. Gross time regressions on small queries are still caught (>1.2 s
absolute), and STRUCTURAL regressions are the plan-shape pins' job
(PlanSpec, 150+ pinned signatures).
"""
import json
import os

d = os.path.dirname(__file__)
med = json.load(open(os.path.join(d, "bench_medians.json")))
med.pop("_total", None)
path = os.path.join(d, "bench_thresholds.json")
thr = json.load(open(path))
seeded = tightened = 0
for q, m in sorted(med.items()):
    lim = max(round(m * 1.5, 2), round(m + 1.2, 2))
    old = thr.get(q)
    if old is None:
        thr[q] = lim
        seeded += 1
        print(f"seed    {q}: {lim}s (median {m:.2f}s)")
    elif lim < old:
        thr[q] = lim
        tightened += 1
        print(f"tighten {q}: {old}s -> {lim}s (median {m:.2f}s)")
with open(path, "w") as f:
    json.dump(thr, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"\n{seeded} seeded, {tightened} tightened; "
      f"{len(thr)} entries total")
