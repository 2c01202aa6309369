#!/usr/bin/env python3
"""Regenerate BENCH_BASELINE.json from a full SPARK_GRAFT_REPEAT=3 sweep's
BENCH_FULL-format output (per-query medians + shared_base_build).
Usage: python3 tools/make_baseline.py <sweep-json> [note-suffix]
"""
import json
import sys

src = json.load(open(sys.argv[1]))
suffix = sys.argv[2] if len(sys.argv) > 2 else ""
queries = src["queries"]
assert src.get("errors") in (None, {}), f"sweep had errors: {src.get('errors')}"
base = {
    "note": (
        "3-run per-query medians at sf0.1, local[32], single full "
        "SPARK_GRAFT_REPEAT=3 sweep in one JVM (same protocol as the "
        "driver bench); gate = tools/bench_gate.py (flag when t > 1.5x "
        "median AND t - median > 2.0s)." + (" " + suffix if suffix else "")
    ),
    "single_run_total_ref": round(
        sum(queries.values()) + src.get("shared_base_build", 0.0), 6),
    "single_run_note": (
        "sum of 3-run per-query medians + shared_base_build"),
    "produced_round": int(sys.argv[3]) if len(sys.argv) > 3 else None,
    "sf": src.get("sf", "/root/testdata/sf0.1"),
    "repeat": 3,
    "shared_base_build": src.get("shared_base_build"),
    "queries": dict(sorted(queries.items())),
}
json.dump(base, open("BENCH_BASELINE.json", "w"), indent=1)
print(f"wrote BENCH_BASELINE.json: {len(queries)} queries, "
      f"total_ref {base['single_run_total_ref']:.1f}s")
