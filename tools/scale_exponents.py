"""Fit time-vs-sf scaling exponents from bench_subset outputs.

Methodology (SCALE.md §11): run `tools/bench_subset.py` over the hot
query families at several scale factors of the SAME generator
(tools/gen_testdata.py — localdata/sf*, one seed, so exponents are
not polluted by generator skew), then for each adjacent sf pair fit
alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo) on the best-of-N times.

The small-sf legs are dominated by fixed per-query overheads (codegen,
AQE planning, Python worker spawn — SCALE.md §10), so the LARGEST
adjacent pair is the meaningful exponent; the smaller pair is printed
for the overhead-floor context.  alpha ~ 1 = linear scaling; alpha
clearly > 1 flags candidate-pair growth or skew (or a corpus whose
true answer itself grows superlinearly — see the §11 notes on the
vocab-saturated synthetic documents table).

Usage:
    python tools/scale_exponents.py 0.01:/tmp/a.json 0.1:/tmp/b.json 1:/tmp/c.json
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    series = []
    for arg in sys.argv[1:]:
        sf, path = arg.split(":", 1)
        with open(path) as fh:
            series.append((float(sf), json.load(fh)["best"]))
    series.sort()
    if len(series) < 2:
        print("need >= 2 sf:path args", file=sys.stderr)
        sys.exit(2)
    # union across ALL series — a query measured only at the larger
    # scale factors must still appear (with em-dashes for the missing
    # legs), not vanish from a sweep that then reads as complete
    names = sorted({n for _, best in series for n in best})
    pairs = list(zip(series, series[1:]))
    hdr = ["query"] + [f"t(sf{sf:g})" for sf, _ in series] + [
        f"α {lo:g}→{hi:g}" for (lo, _), (hi, _) in pairs
    ]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for name in names:
        row = [name]
        for _, best in series:
            t = best.get(name)
            row.append("—" if t is None else f"{t:.2f}s")
        for (lo, blo), (hi, bhi) in pairs:
            tlo, thi = blo.get(name), bhi.get(name)
            if tlo is not None and thi is not None and tlo > 0 and thi > 0:
                alpha = math.log(thi / tlo) / math.log(hi / lo)
                row.append(f"{alpha:.2f}")
            else:
                row.append("—")
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
