#!/usr/bin/env python3
"""Driver-session vs solo-bench ratio table (round-13 VERDICT item 2).

The driver's per-round bench artifact (BENCH_r{N}.json) is a wrapper that
keeps only a 2000-char stdout tail, so full per-query driver medians are
lost; what survives is the compact trailer (total, slowest-5, since r14
also slowest-5 GC ms + total GC ms) plus whatever spread triples the tail
happens to retain. This script cross-references that against one or two
full solo artifacts (the round-opening and any closing solo bench) and
emits a markdown ratio table, so the driver/solo gap is a committed,
regenerable artifact instead of judge arithmetic.

Usage:
  python3 tools/driversolo.py BENCH_r13.json BENCH_r13_solo.json \
      [BENCH_r13_solo_post.json] > DRIVER_SOLO.md
"""
import json
import re
import sys


def load_solo(path):
    """First JSON line of a solo Bench run (the full per-query artifact)."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "queries" in d:
                    return d
    raise SystemExit(f"{path}: no bench JSON line found")


def load_driver(path):
    """Driver wrapper: returns (trailer dict, per-query medians recovered
    from any spread triples surviving in the tail)."""
    d = json.load(open(path))
    tail = d.get("tail", "")
    trailer = None
    for m in re.finditer(r'\{"metric":"total".*?\}(?=\s|$)', tail):
        try:
            cand = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if "slowest" in cand:
            trailer = cand
    if trailer is None:
        raise SystemExit(f"{path}: no trailer with slowest-5 found in tail")
    partial = {}
    for m in re.finditer(r'"([a-z0-9_]+)":\[([\d.]+),([\d.]+),([\d.]+)\]', tail):
        name, vals = m.group(1), sorted(float(m.group(i)) for i in (2, 3, 4))
        partial[name] = vals[1]
    return trailer, partial


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    driver_path, solo_path = sys.argv[1], sys.argv[2]
    post_path = sys.argv[3] if len(sys.argv) > 3 else None
    trailer, partial = load_driver(driver_path)
    solo = load_solo(solo_path)
    post = load_solo(post_path) if post_path else None

    out = []
    out.append(f"# Driver-session vs solo bench — {driver_path}")
    out.append("")
    out.append(f"Driver total: **{trailer['value']:.2f} s** over "
               f"{trailer['n_queries']} queries "
               f"({trailer['value']/trailer['n_queries']:.3f} s/q); "
               f"solo-open total {solo['value']:.2f} s "
               f"({solo['value']/len(solo['queries']):.3f} s/q)"
               + (f"; solo-close total {post['value']:.2f} s "
                  f"({post['value']/len(post['queries']):.3f} s/q)" if post else "")
               + f". Driver/solo-open ratio: "
               f"**{trailer['value']/solo['value']:.2f}×**.")
    if "gc_ms_total" in trailer:
        out.append(f"Driver-session total GC: {trailer['gc_ms_total']} ms.")
    out.append("")
    out.append("## Slowest driver queries (from the surviving trailer)")
    out.append("")
    hdr = "| query | driver med (s) | solo open (s) | ratio |"
    if post:
        hdr = "| query | driver med (s) | solo open (s) | solo close (s) | ratio vs open |"
    if "slowest_gc_ms" in trailer:
        hdr += " driver GC (ms) |"
    out.append(hdr)
    out.append("|" + "---|" * (hdr.count("|") - 1))
    for name, dmed in trailer["slowest"].items():
        s = solo["queries"].get(name)
        p = post["queries"].get(name) if post else None
        ratio = f"{dmed/s:.2f}×" if s else "n/a (added after solo run)"
        row = f"| {name} | {dmed:.2f} | " + (f"{s:.2f}" if s else "—") + " | "
        if post:
            row += (f"{p:.2f}" if p else "—") + " | "
        row += f"{ratio} |"
        if "slowest_gc_ms" in trailer:
            row += f" {trailer['slowest_gc_ms'].get(name, '—')} |"
        out.append(row)
    if partial:
        rows = []
        for name, dmed in sorted(partial.items()):
            s = solo["queries"].get(name)
            if s and name not in trailer["slowest"]:
                rows.append((dmed / s, name, dmed, s))
        if rows:
            out.append("")
            out.append("## Per-query medians recovered from the tail's spread triples")
            out.append("")
            out.append("| query | driver med (s) | solo open (s) | ratio |")
            out.append("|---|---|---|---|")
            for r, name, dmed, s in sorted(rows, reverse=True):
                out.append(f"| {name} | {dmed:.2f} | {s:.2f} | {r:.2f}× |")
    print("\n".join(out))


if __name__ == "__main__":
    main()
