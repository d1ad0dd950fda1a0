#!/usr/bin/env python3
"""Regenerate bench_budget.json (r11 verdict task 7).

Budgets = per-query MIN across the given QUIET bench_detail_*.json rolls
multiplied by a 1.5 load-drift factor (BASELINE.md records 1.105x median
zero-delta drift between quiet rolls; 1.5x covers the moderate-load band
without absorbing real regressions). With the Bench multiplier of 2.0 a
row flags at 3x its quiet MIN - loud enough for code regressions, quiet
through host noise; externally loaded rolls (pre-warmup loadavg > 2) are
additionally gated into budget_violations_suspect_load by Bench itself.

Usage: python3 scripts/regen_budget.py bench_detail_a.json [b.json ...]
Refuses rolls whose pre-warmup loadavg exceeds 2.0.
"""
import json, sys

DRIFT = 1.5

def main(paths):
    mins = {}
    for p in paths:
        d = json.load(open(p))
        # quiet = the 1-MINUTE pre-warmup average; the 5/15-min tails of
        # back-to-back rolls carry the PREVIOUS roll's own threads, not
        # external load (and a loaded roll can only inflate times, so a
        # MIN across rolls is never made too tight by one)
        load = [float(x) for x in d.get("loadavg_start", "0,0,0").split(",") if x]
        if load and load[0] > 2.0:
            print(f"REFUSED {p}: loadavg_start {d['loadavg_start']} - not a quiet roll")
            sys.exit(1)
        for q, row in d["queries"].items():
            best = row["best"]
            mins[q] = min(mins.get(q, best), best)
    out = {
        "_comment": ("Per-query wall-clock budgets (seconds): quiet-host "
            f"per-row MIN across {len(paths)} rolls x {DRIFT} load-drift factor "
            "(r11 verdict task 7 - raw quiet MINs flagged 22 refuted rows on one "
            "loaded driver roll). Bench flags best > multiplier x budget into "
            "budget_violations (quiet host) or budget_violations_suspect_load "
            "(pre-warmup loadavg > 2). Regenerate with scripts/regen_budget.py "
            "from quiet full rolls."),
        "multiplier": 2.0,
        "budgets": {q: round(v * DRIFT, 6) for q, v in sorted(mins.items())},
    }
    json.dump(out, open("bench_budget.json", "w"), indent=1)
    print(f"wrote bench_budget.json: {len(mins)} rows from {len(paths)} quiet rolls")

if __name__ == "__main__":
    main(sys.argv[1:])
