#!/usr/bin/env python3
"""Render the frozen per-key BASELINE table from a Bench mirror
(target/bench.json — three JSON lines; the middle one carries the
per-key medians and minima). Prints the markdown table body plus the
headline numbers, for pasting into BASELINE.md at a re-freeze."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
lines = [json.loads(l) for l in open(path) if l.strip()]
detail = next(d for d in lines if "queries" in d)
q, qmin = detail["queries"], detail["queries_min"]
print(f"total(medians)={detail['value']}  total(min)={detail['total_min']}"
      f"  n={len(q)}  loadavg={detail['loadavg_start']}->{detail['loadavg_end']}"
      f"  contended_keys={detail['contended_keys']}"
      f"  retried_keys={detail['retried_keys']}")
print()
print("| key | median | min |")
for k in sorted(q):
    print(f"| {k} | {q[k]:.3f} | {qmin[k]:.3f} |")
