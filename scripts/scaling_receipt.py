#!/usr/bin/env python3
"""Assemble the cross-sf scaling receipt (scaling_r16.json).

Inputs: three per-gate bench maps (the `target/bench_queries.json`
shape) captured at sf0.001 / sf0.01 / sf0.1 on ONE build — copied
aside as receipts/bench_sf{sf}_rNN.json by the caller.

Per gate: warm-min seconds at each sf, and the empirical scaling
exponent alpha = log10(T(sf_hi)/T(sf_lo)) per decade between adjacent
sfs. alpha ~ 0 means fixed overhead dominates (fine), ~1 linear, >1
super-linear. Gates that are QUADRATIC BY DESIGN (exact all-pairs
baselines whose scale paths are separate gates) are listed, not
flagged. A gate is FLAGGED when its 0.01->0.1 exponent exceeds the
bound AND it costs enough at sf0.1 for the exponent to be signal
(tiny absolute times flip on scheduler noise).

Usage: scripts/scaling_receipt.py <round> <out.json> <sf001.json> <sf01.json> <sf1.json>
"""
import json
import math
import sys

# exact all-pairs / corpus-squared baselines by design; their
# at-scale replacements (s02/s03/s04, d02/d07, s06) are measured too
QUADRATIC_BY_DESIGN = {
    "s01_ann_bruteforce",   # exact brute-force baseline for recall
    "s05_knn_graph",        # exact kNN graph (IVF twin: s06)
    "d04_embedding_neardup",  # exact cosine pairs (LSH twin: d07)
    "s16_mmr_rerank",       # greedy rerank over s01's exact candidates
}

ALPHA_BOUND = 1.15
MIN_SECONDS_AT_SF01 = 1.0


def warm_min(path):
    with open(path) as f:
        d = json.load(f)
    w1, w2 = d["queries_warm1"], d["queries_warm2"]
    out = {}
    for k in w1:
        a, b = w1[k], w2.get(k, -1)
        if a < 0 or b < 0:
            continue  # errored in some pass: no exponent
        out[k] = min(a, b)
    return out


def alpha(t_lo, t_hi):
    if t_lo <= 0 or t_hi <= 0:
        return None
    return math.log10(t_hi / t_lo)  # one decade between adjacent sfs


def family(name):
    i = 0
    while i < len(name) and not name[i].isdigit():
        i += 1
    return name[:i]


def main():
    rnd, out_path, p001, p01, p1 = sys.argv[1:6]
    t001, t01, t1 = warm_min(p001), warm_min(p01), warm_min(p1)
    gates = sorted(set(t001) & set(t01) & set(t1))
    per_gate = {}
    flagged = []
    for g in gates:
        a_lo = alpha(t001[g], t01[g])
        a_hi = alpha(t01[g], t1[g])
        per_gate[g] = {
            "sf0.001": round(t001[g], 3), "sf0.01": round(t01[g], 3),
            "sf0.1": round(t1[g], 3),
            "alpha_001_01": None if a_lo is None else round(a_lo, 3),
            "alpha_01_1": None if a_hi is None else round(a_hi, 3),
            "quadratic_by_design": g in QUADRATIC_BY_DESIGN,
        }
        if (g not in QUADRATIC_BY_DESIGN and a_hi is not None
                and a_hi > ALPHA_BOUND and t1[g] >= MIN_SECONDS_AT_SF01):
            flagged.append(g)
    fams = {}
    for g in gates:
        fams.setdefault(family(g), {"sf0.001": 0.0, "sf0.01": 0.0, "sf0.1": 0.0})
        for sf, t in (("sf0.001", t001[g]), ("sf0.01", t01[g]), ("sf0.1", t1[g])):
            fams[family(g)][sf] += t
    per_family = {}
    for f, ts in sorted(fams.items()):
        # alpha() is None when a summed time is 0 (3-decimal inputs can
        # legitimately round a sub-ms family to 0.0 at one sf) — guard
        # like the per-gate path instead of crashing round()
        fam_a = alpha(ts["sf0.01"], ts["sf0.1"])
        per_family[f] = {
            "sf0.001": round(ts["sf0.001"], 2), "sf0.01": round(ts["sf0.01"], 2),
            "sf0.1": round(ts["sf0.1"], 2),
            "alpha_01_1": None if fam_a is None else round(fam_a, 3),
        }
    receipt = {
        "round": rnd,
        "basis": "warm-min seconds per gate at sf0.001/0.01/0.1, one build",
        "alpha_definition": "log10(T_hi/T_lo) per x10 data decade; ~0 = "
                            "fixed overhead, 1 = linear, >1 = super-linear",
        "flag_rule": f"alpha_01_1 > {ALPHA_BOUND} and sf0.1 time >= "
                     f"{MIN_SECONDS_AT_SF01}s, excluding quadratic-by-design baselines",
        "n_gates": len(gates),
        "flagged_superlinear": flagged,
        "families": per_family,
        "gates": per_gate,
    }
    with open(out_path, "w") as f:
        json.dump(receipt, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}: {len(gates)} gates, flagged={flagged}")


if __name__ == "__main__":
    main()
