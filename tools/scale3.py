#!/usr/bin/env python3
"""Three-point scale-curve merge (dev aid, same standing as diff.py): combine
two ScaleBench artifacts that share a middle scale point — A->B (e.g.
sf0.1 -> sf1) and B->C (e.g. sf1 -> sf3) — into per-query (tA, tB, tC)
medians with a fitted growth exponent, written as SCALE_r{N}.json.

The exponent is the least-squares slope of log(time) vs log(data): with
three (size, time) points (1, tA), (rAB, tB), (rAB*rBC, tC) it
distinguishes n*log n (exponent ~1.0-1.1) from polynomial creep (>1.3) —
the thing a single two-point ratio cannot do.

Usage: python3 tools/scale3.py SCALE_ab.json SCALE_bc.json out.json
"""
import json
import math
import sys


def main() -> int:
    ab = json.loads(open(sys.argv[1]).readline())
    bc = json.loads(open(sys.argv[2]).readline())
    r_ab, r_bc = ab["data_ratio"], bc["data_ratio"]
    rows = {}
    for name, q in bc["queries"].items():
        if name not in ab["queries"]:
            continue
        a = ab["queries"][name]
        # shared middle point measured twice (ab's b, bc's a) — keep both,
        # fit on ab.a, ab.b, bc.b so each segment uses ITS OWN session's
        # baseline (cross-session drift cancels within a segment).
        xs = [1.0, r_ab, r_ab * r_bc]
        ys = [a["a_median"], a["b_median"], a["b_median"] * (q["b_median"] / q["a_median"])]
        lx = [math.log(x) for x in xs]
        ly = [math.log(y) for y in ys]
        n = len(xs)
        mx, my = sum(lx) / n, sum(ly) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / sum(
            (x - mx) ** 2 for x in lx)
        rows[name] = {
            "t_a": a["a_median"], "t_b": a["b_median"],
            "t_b2": q["a_median"], "t_c": q["b_median"],
            # the third point the fit actually uses (ab.b * bc ratio) —
            # emitted so a reader plotting the curve sees the fitted
            # series, not an inconsistent mix of sessions (round-12
            # ADVICE): t_c is segment-2's raw measurement, t_c_chained
            # is that measurement re-based onto segment-1's session.
            "t_c_chained": ys[2],
            "ratio_ab": a["ratio"], "ratio_bc": q["ratio"],
            "exponent": round(slope, 3),
        }
    out = {
        "metric": "scale_curve_3pt",
        "dirs": [ab["dir_a"], ab["dir_b"], bc["dir_b"]],
        "data_ratios": [r_ab, r_bc],
        "note": ("t_b (segment-1 session) and t_b2 (segment-2 session) both "
                 "measure the middle SF; the exponent fit chains segment "
                 "ratios so cross-session drift cancels"),
        "queries": rows,
    }
    with open(sys.argv[3], "w") as f:
        json.dump(out, f, indent=1)
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["exponent"]):
        print(f"{name:32s} exp={r['exponent']:5.2f} "
              f"ab={r['ratio_ab']:.2f} bc={r['ratio_bc']:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
