#!/usr/bin/env python3
"""Per-query perf gate: compare a bench run against BENCH_BASELINE.json.

Usage: python3 tools/bench_gate.py [bench-json] [baseline-json]
  bench-json    defaults to the newest BENCH_r*.json in the repo root;
                accepts either the raw one-line Bench output
                ({"metric":"total",...,"queries":{...}}) or the driver
                wrapper whose "tail" field embeds that line.
  baseline-json defaults to BENCH_BASELINE.json (3-run medians at sf0.1).

A query REGRESSES when either tier fires:
  tier 1: time > 1.5x its baseline median AND the excess is more than
    2.0s absolute — the floor keeps small queries from flagging on
    fixed-overhead noise: measured on this host (round 4), single runs
    routinely read +1-1.5s per query vs a 3-run median, uniformly at
    random across queries, so a 1.0s floor produced a different set of
    3-6 spurious flags on every otherwise-unchanged full run.
  tier 2 (r14 verdict #7): time > 2x its baseline median, NO absolute
    floor — so sub-2s queries can flag at all. Safe against the same
    +1-1.5s ambient noise ONLY because Bench's retry pass reruns every
    tier-eligible outlier and the headline publishes min(first, rerun):
    a tier-2 flag therefore means BOTH runs exceeded 2x the median,
    which ambient load essentially never does (r14 calibration: 14
    single-run tier-2 outliers, all with rerun at median). Do not apply
    tier 2 to a bench artifact produced without the retry fold.
  q_pipeline_incremental carries a TIGHTER tier-2 ratio of 1.75x (r13
    verdict #1 / r14 verdict #5): the flagship operational loop sat at
    2.7x once (ambient, closed in r14) and its guard is now structural.

The whole-RUN check (total > 1.4x the recorded single-run total
reference — NOT the sum of medians, which single-run noise exceeds by
~1.5x accumulated over ~100 queries) still catches broad regressions
the per-query floors forgive; any real plan-shape regression on heavy
queries (the r3 case: 2.8s -> 20s) clears the floor instantly.

Cross-round drift (r14 verdict #1): if BENCH_ANCHOR_r13.json exists,
the BASELINE's medians are also compared against those frozen r13
medians (rule: >1.5x + 0.3s excess, medians-vs-medians — single-run
values are never drift evidence). Unexplained drift flags turn the
gate red; explained ones (tools/make_baseline.py EXPLAINED, embedded
in the baseline's drift_vs_r13 section) are printed but green.

Exit 1 on any regression / missing baseline / unexplained drift, so a
future round's gate turns red instead of relying on judge archaeology.
"""
import glob
import json
import os
import re
import sys

RATIO = 1.5
ABS_FLOOR = 2.0  # seconds (see docstring: measured single-run noise)
REL_RATIO = 2.0  # tier 2: relative-only, needs the min-fold (docstring)
SPECIAL_REL = {"q_pipeline_incremental": 1.75}
TOTAL_RATIO = 1.4
DRIFT_RATIO = 1.5
DRIFT_ABS_FLOOR = 0.3
ANCHOR = "BENCH_ANCHOR_r13.json"


def load_bench(path):
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return doc["queries"]
    # driver wrapper: the bench line is embedded in "tail"
    text = doc.get("tail", raw) if isinstance(doc, dict) else raw
    dec = json.JSONDecoder()
    best = None
    for m in re.finditer(r'\{"metric":', text):
        try:
            obj, _ = dec.raw_decode(text, m.start())
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "queries" in obj:
            best = obj  # keep the LAST parseable bench line
    if best is None:
        sys.exit(f"no bench JSON line found in {path}")
    return best["queries"]


def drift_check(base_doc):
    """Baseline medians vs the frozen r13 anchor; returns n unexplained."""
    if not os.path.exists(ANCHOR):
        print(f"DRIFT: {ANCHOR} missing — cross-round drift unchecked")
        return 1
    anchor = json.load(open(ANCHOR))["queries"]
    base = base_doc["queries"]
    explained = set(
        base_doc.get("drift_vs_r13", {}).get("explained", {}))
    overlap = sorted(set(anchor) & set(base))
    bad = 0
    for n in overlap:
        a, c = anchor[n], base[n]
        if c > DRIFT_RATIO * a and c - a > DRIFT_ABS_FLOOR:
            if n in explained:
                print(f"DRIFT-EXPLAINED {n}: r13 {a:.2f}s -> {c:.2f}s "
                      f"({c / a:.1f}x)")
            else:
                bad += 1
                print(f"DRIFT {n}: r13 median {a:.2f}s -> {c:.2f}s "
                      f"({c / a:.1f}x) — unexplained cross-round drift")
    ratios = sorted(base[n] / anchor[n] for n in overlap)
    print(f"== drift_vs_r13: {len(overlap)} overlap queries, median "
          f"ratio {ratios[len(ratios) // 2]:.2f}x, {bad} unexplained "
          f"flag(s)")
    return bad


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else None
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.json"
    if not bench_path:
        cands = sorted(glob.glob("BENCH_r*.json"))
        if not cands:
            sys.exit("no BENCH_r*.json found; pass a path")
        bench_path = cands[-1]
    bench = load_bench(bench_path)
    base_doc = json.load(open(base_path))
    base = base_doc["queries"]

    missing = sorted(set(bench) - set(base))
    regressed = []
    for name, t in sorted(bench.items()):
        b = base.get(name)
        if b is None:
            continue
        tier1 = t > RATIO * b and t - b > ABS_FLOOR
        tier2 = t > SPECIAL_REL.get(name, REL_RATIO) * b
        if tier1 or tier2:
            regressed.append((name, b, t,
                              "+".join(["t1"] * tier1 + ["t2"] * tier2)))
    for name, b, t, tier in regressed:
        print(f"REGRESSED[{tier}] {name}: baseline {b:.2f}s -> {t:.2f}s "
              f"({t / b:.1f}x)")
    for name in missing:
        print(f"NO-BASELINE {name}: add a median to BENCH_BASELINE.json")
    total = sum(bench.values())
    # like-for-like total reference: a recorded single-run sweep total
    # (per-query noise accumulates over a run, so the sum of medians is
    # not comparable); fall back to 1.5x the median sum if absent
    base_total = base_doc.get("single_run_total_ref",
                              1.5 * sum(base[n] for n in bench if n in base))
    slow_total = base_total > 0 and total > TOTAL_RATIO * base_total
    if slow_total:
        print(f"REGRESSED total: baseline sum {base_total:.1f}s -> "
              f"{total:.1f}s ({total / base_total:.1f}x)")
    drift_bad = drift_check(base_doc)
    print(f"== {os.path.basename(bench_path)}: {len(bench)} queries, "
          f"total {total:.1f}s (baseline sum {base_total:.1f}s); "
          f"{len(regressed)} regressed, {len(missing)} missing baseline, "
          f"{drift_bad} drift")
    sys.exit(1 if regressed or missing or slow_total or drift_bad else 0)


if __name__ == "__main__":
    main()
