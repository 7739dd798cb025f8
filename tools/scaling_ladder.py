#!/usr/bin/env python
"""Scaling ladder: compare two bench.py JSON outputs at different SFs.

    python tools/scaling_ladder.py /tmp/bench_sf01.json /tmp/bench_sf1.json \
        --factor 10

Prints a markdown table of per-query median seconds at both scales, the
time ratio, and the implied scaling exponent e (t2/t1 = factor**e):
e ~= 1 is linear, e < 1 sublinear (fixed cost amortizing / dim-bound
queries), e > 1 superlinear (the thing the ladder exists to catch).
Index lifecycles are reported in a second table. No interpretation is
baked in — BASELINE.md carries the prose.
"""

from __future__ import annotations

import argparse
import json
import math


def _exp(t1: float, t2: float, factor: float) -> float | None:
    if t1 <= 0 or t2 <= 0:
        return None
    return math.log(t2 / t1) / math.log(factor)


def _table(a: dict, b: dict, factor: float, spread_a=None, spread_b=None) -> list[str]:
    lines = ["| query | sf0.1 med (s) | sf1 med (s) | ratio | exponent |",
             "|---|---|---|---|---|"]
    for q in sorted(set(a) & set(b), key=lambda q: -(b[q])):
        e = _exp(a[q], b[q], factor)
        ratio = b[q] / a[q] if a[q] > 0 else float("inf")
        lines.append(
            f"| `{q}` | {a[q]:.3f} | {b[q]:.3f} | {ratio:.1f}x | "
            f"{'n/a' if e is None else f'{e:.2f}'} |"
        )
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("large")
    ap.add_argument("--factor", type=float, default=10.0)
    args = ap.parse_args()
    a = json.load(open(args.small))
    b = json.load(open(args.large))

    print(f"suite: {a['value']:.1f} s -> {b['value']:.1f} s "
          f"(x{b['value']/a['value']:.1f} at {args.factor:g}x data, "
          f"exponent {_exp(a['value'], b['value'], args.factor):.2f})\n")
    print("\n".join(_table(a["queries"], b["queries"], args.factor)))
    ia = {k: v for k, v in a.get("index_secs", {}).items() if isinstance(v, (int, float))}
    ib = {k: v for k, v in b.get("index_secs", {}).items() if isinstance(v, (int, float))}
    if ia and ib:
        print("\nindex lifecycles:\n")
        print("\n".join(_table(ia, ib, args.factor)))


if __name__ == "__main__":
    main()
