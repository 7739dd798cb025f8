#!/usr/bin/env python
"""4-point scaling-ladder table from four bench JSONs (sf0.1/1/10/100).

Extends tools/scaling_ladder.py (2-point) to the r12 four-decade run:
per-leg medians at each scale plus per-decade exponents
e = log10(t_hi/t_lo) for a 10x data step. Covers both the query suite
(``queries``) and the index-lifecycle block (``index_secs`` — single
samples, not medians). Emits a markdown table for BASELINE.md.

Usage:
    python tools/ladder4_table.py benchruns/r12_ladder_sf0.1.json \
        benchruns/r12_ladder_sf1.json benchruns/r12_ladder_sf10.json \
        benchruns/r12_ladder_sf100.json
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    paths = sys.argv[1:5]
    if len(paths) != 4:
        sys.exit(__doc__)
    runs = [json.load(open(p)) for p in paths]
    for block, note in (("queries", "repeats=3 median"), ("index_secs", "single sample")):
        names = [n for n in runs[0].get(block, {}) if all(n in r.get(block, {}) for r in runs)]
        if not names:
            continue
        print(f"\n#### {block} ({note})\n")
        print("| leg | sf0.1 s | sf1 s | sf10 s | sf100 s | e01 | e12 | e23 |")
        print("|---|---|---|---|---|---|---|---|")
        for n in sorted(names):
            ts = [r[block][n] for r in runs]
            es = [
                (math.log10(hi / lo) if lo > 0 and hi > 0 else float("nan"))
                for lo, hi in zip(ts, ts[1:])
            ]
            cells = " | ".join(f"{t:.3g}" for t in ts)
            ecells = " | ".join(f"{e:.2f}" for e in es)
            print(f"| `{n}` | {cells} | {ecells} |")
        worst = max(
            (max((math.log10(hi / lo) for lo, hi in zip([r[block][n] for r in runs], [r[block][n] for r in runs][1:]) if lo > 0 and hi > 0), default=float("-inf")), n)
            for n in names
        )
        print(f"\nworst per-decade exponent in {block}: {worst[0]:.2f} (`{worst[1]}`)")


if __name__ == "__main__":
    main()
