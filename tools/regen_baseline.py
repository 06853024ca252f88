#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchBaseline.scala from bench runs.

Usage: python3 tools/regen_baseline.py <label> <run1.json> [run2.json ...]

Takes the per-query MIN across the given graft.Bench JSON outputs
(quiet-box min-of-N convention) and rewrites the BenchBaseline map.
<label> is the provenance line baked into the header (e.g. "Round 13
(fifth regen)") so the committed source never carries a stale round tag.
"""
import json
import sys

HEADER = '''package graft

/** Per-query quiet-box reference timings (local[32], sf0.1) used by Bench's
  * outlier re-time rule: a driver-side measurement exceeding 2x its twin
  * here is treated as transient contention and re-run once. Regenerated
  * each round from the recorded quiet-box runs (tools/regen_baseline.py,
  * min-of-N); queries without an entry (newly added this round) fall back
  * to the absolute >2 s rule.
  * %s: all entries from %s quiet-box full-suite
  * runs recorded with NO co-tenant load (the r11 verdict's clean-artifact
  * ask).
  */
object BenchBaseline {
  val local: Map[String, Double] = Map(
'''


def main(label, paths):
    mins = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for q, s in d["queries"].items():
            mins[q] = min(mins.get(q, 1e9), s)
    if not mins:
        raise SystemExit("no queries found in the given runs")
    out = HEADER % (label, len(paths))
    rows = [f'    "{q}" -> {s:.4f},' for q, s in sorted(mins.items())]
    rows[-1] = rows[-1].rstrip(",")
    out += "\n".join(rows) + ")\n}\n"
    with open("src/main/scala/graft/BenchBaseline.scala", "w") as f:
        f.write(out)
    print(f"wrote {len(mins)} entries from {len(paths)} runs")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: regen_baseline.py <label> <run1.json> [run2.json ...]")
    main(sys.argv[1], sys.argv[2:])
