#!/usr/bin/env python3
"""Assemble the 3-point scale curve (1x/10x/30x ScaleUp corpora) from
TimeQuery logs. Dev tool, driver-side python only.

Usage: tools/build_curve.py <baseLogs> <x10Logs> <x30Logs> <outJson>
  each <*Logs> = comma-separated list of log files for that scale point.

Estimator: MIN over every rep in every listed log (TimeQuery prints
`reps=a,b,c` alongside the median). Min-of-reps is the right estimator
on a virtualized host whose steal time is invisible to the guest
(observed here: identical reps swinging 1-10x with zero GC/iowait and
"user" CPU inflating with host congestion — the guest charges stolen
cycles to usr). The minimum rep is the least-throttled observation and
the closest available proxy for the machine's true capability; medians
from the same logs embed whatever congestion happened to coincide.
"""
import json
import re
import sys

LINE = re.compile(
    r"^TIME (\S+)\s+median=\s*([0-9.]+) s\s+reps=([0-9.,]+)\s+rows=(\d+)")


def parse_min(paths):
    out = {}
    for path in paths.split(","):
        with open(path) as f:
            for line in f:
                m = LINE.match(line.strip())
                if not m:
                    continue
                name = m.group(1)
                best = min(float(x) for x in m.group(3).split(","))
                rows = int(m.group(4))
                if name not in out or best < out[name][0]:
                    out[name] = (best, rows)
    return out


def main():
    base, x10, x30, out_path = sys.argv[1:5]
    b, t, th = parse_min(base), parse_min(x10), parse_min(x30)
    # Attribution notes are hand-written after generation (they encode
    # per-query diagnosis, not anything derivable from the logs) — carry
    # them over from the existing output so a regeneration that adds
    # queries doesn't silently drop the prior round's attributions.
    old_notes = {}
    try:
        with open(out_path) as f:
            for name, q in json.load(f).get("queries", {}).items():
                if "note" in q:
                    old_notes[name] = q["note"]
    except (OSError, ValueError):
        pass
    queries = {}
    # No silent caps (advisor finding): a truncated/partial log would
    # quietly shrink the curve — name what each scale point is missing.
    union = sorted(set(b) | set(t) | set(th))
    for point, have in (("1x", b), ("10x", t), ("30x", th)):
        missing = [n for n in union if n not in have]
        if missing:
            print(f"SKIPPED at {point} (absent from its logs): "
                  f"{','.join(missing)}")
    for name in sorted(b):
        if name not in t or name not in th:
            continue
        (bs, br), (ts, tr), (hs, hr) = b[name], t[name], th[name]
        queries[name] = {
            "sec_1x": bs, "sec_10x": ts, "sec_30x": hs,
            "rows_1x": br, "rows_10x": tr, "rows_30x": hr,
            "ratio_10x": round(ts / bs, 2) if bs > 0 else None,
            "ratio_30x": round(hs / bs, 2) if bs > 0 else None,
            "step_30x_over_10x": round(hs / ts, 2) if ts > 0 else None,
        }
        if name in old_notes:
            queries[name]["note"] = old_notes[name]
    doc = {
        "what": ("3-point scale curve: TimeQuery min-of-reps (see module "
                 "docstring for why min, not median, on this host) over "
                 "ScaleUp corpora at replicas=1/10/30 of the sf0.1 "
                 "fixture, one session. ratio_* = wall vs 1x; "
                 "step_30x_over_10x ~ 3 means linear in that decade (data "
                 "grew 3x), < 3 sublinear. rows_* show output growth for "
                 "attribution (the replica construction turns every doc "
                 "into an N-way near-dup clique, so dedup pair outputs "
                 "grow ~N^2)."),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}: {len(queries)} queries")


if __name__ == "__main__":
    main()
