#!/usr/bin/env python3
"""Second-decade scaling leg (r15 verdict #5): sf0.1 -> sf1 exponents
for the top-cost queries, run against the synthetic sf1 twin
(tools/MakeSf1 — structure-preserving 10x of every scaling table).

Reads two BENCH_FULL-style JSONs (the sf0.1 reference sweep and the sf1
sweep over the same query subset) and emits per-QUERY and per-family
exponents: exponent = ln(t_sf1 / t_sf0.1) / ln(10). The committed
SCALING artifact's first decade (sf0.01 -> sf0.1, tools/scaling.py)
stays as-is; this extends the curve one more decade for the queries
whose cost actually matters.

A query flags when exponent > 1.3 AND t_sf1 > 2s (same rule as
scaling.py: superlinear growth on real work — the first place a hidden
n^2 shows before a 100x scale-up).

Usage: scaling_sf1.py <bench_sf0.1.json> <bench_sf1.json> <out.json>
"""
import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from scaling import family_of  # noqa: E402

NOISE_FLOOR_S = 2.0
FLAG_EXPONENT = 1.3
SIZE_RATIO = 10.0

# Investigated flags (same pattern as make_baseline.py EXPLAINED): the
# entry still appears in the artifact, it just doesn't count unexplained.
EXPLAINED = {
    # ROUND15_NOTES "L47d" + ROUND16_NOTES: the 24x2-plane LSH front-end
    # is pinned by the recall CERTIFICATE (miss <~1e-5 within the 62-bit
    # packed-bucket budget), so bucket occupancy grows with the corpus
    # and candidate volume ~n^2/2^p per table — exponent 1.33 over this
    # decade, still far under the naive all-pairs 2.0 because partners
    # are capped and scored scan-side. The production move at real
    # growth is planes ~ log n, which trades the exact-oracle
    # certificate for volume — a documented choice, not a hidden n^2.
    "q_dbscan_ann": (
        "certified-recall LSH front-end: plane count pinned by the "
        "exact-oracle certificate (ROUND15_NOTES L47d math); candidate "
        "volume ~n^2/2^p by design, capped and scan-side-scored"),
}


def main():
    p01, p1, out = sys.argv[1:4]
    b01 = json.load(open(p01))
    b1 = json.load(open(p1))
    qs = sorted(set(b01["queries"]) & set(b1["queries"])
                - set(b01.get("errors", {})) - set(b1.get("errors", {})))
    per_q = {}
    fams = {}
    flagged = []
    explained = {}
    for q in qs:
        t0, t1 = b01["queries"][q], b1["queries"][q]
        exp = math.log(max(t1 / t0, 1e-9)) / math.log(SIZE_RATIO)
        flag = bool(exp > FLAG_EXPONENT and t1 > NOISE_FLOOR_S)
        per_q[q] = {"t_sf0.1": round(t0, 3), "t_sf1": round(t1, 3),
                    "ratio": round(t1 / t0, 2), "exponent": round(exp, 3),
                    "flagged": flag and q not in EXPLAINED}
        if flag:
            if q in EXPLAINED:
                per_q[q]["explained"] = EXPLAINED[q]
                explained[q] = EXPLAINED[q]
            else:
                flagged.append(q)
        f = fams.setdefault(family_of(q), {"t0": 0.0, "t1": 0.0, "n": 0})
        f["t0"] += t0
        f["t1"] += t1
        f["n"] += 1
    fam_table = {}
    for fam, e in sorted(fams.items()):
        exp = math.log(max(e["t1"] / e["t0"], 1e-9)) / math.log(SIZE_RATIO)
        fam_table[fam] = {"n_queries": e["n"], "t_sf0.1": round(e["t0"], 2),
                          "t_sf1": round(e["t1"], 2),
                          "exponent": round(exp, 3)}
    art = {
        "metric": "scaling_curve_sf1",
        "note": ("second decade (sf0.1 -> synthetic sf1 twin, 10x rows, "
                 "tools/MakeSf1): exponent = ln(t_sf1/t_sf0.1)/ln(10); "
                 "flag when exponent > 1.3 and t_sf1 > 2s"),
        "n_queries": len(qs),
        "n_flagged": len(flagged),
        "flagged": flagged,
        "explained": explained,
        "families": fam_table,
        "queries": per_q,
    }
    json.dump(art, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(qs)} queries, {len(flagged)} flagged, "
          f"{len(explained)} explained")
    for q in flagged:
        e = per_q[q]
        print(f"  FLAG {q}: {e['t_sf0.1']}s -> {e['t_sf1']}s "
              f"(exp {e['exponent']})")


if __name__ == "__main__":
    main()
