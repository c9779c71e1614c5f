#!/usr/bin/env python3
"""Fold the r12 sweep logs into QUIET_MEDIANS_sf1.json and SCALE_CURVE.json
WITHOUT dropping prior-round entries (the raw TIME logs behind older rounds
live in /tmp and don't survive the host — build_qm_sf1/build_curve rebuild
from logs only, so a naive regeneration would erase them). Dev tool.

Usage: tools/merge_r12_scale.py <baseLog> <sf1Log> <sf3Log> [overrideBase sf1 sf3]
Later override logs win per query (single-query fresh-JVM re-measure
protocol for entries whose chunked reps were noisy).
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s\s+reps=([0-9.,]+)\s+rows=(\d+)")


def parse(path, est):
    out = {}
    try:
        f = open(path)
    except OSError:
        return out
    for line in f:
        m = LINE.match(line.strip())
        if not m:
            continue
        reps = [float(x) for x in m.group(3).split(",")]
        v = min(reps) if est == "min" else sorted(reps)[len(reps) // 2]
        out[m.group(1)] = (v, int(m.group(4)))
    return out


def layered(paths, est):
    out = {}
    for p in paths:
        out.update(parse(p, est))
    return out


def main():
    base_p, sf1_p, sf3_p = sys.argv[1:4]
    ov = (sys.argv[4:7] + [None] * 3)[:3]
    # QUIET_MEDIANS_sf1: median estimator (matches the file's protocol).
    base = layered([p for p in [base_p, ov[0]] if p], "median")
    sf1 = layered([p for p in [sf1_p, ov[1]] if p], "median")
    qm = json.load(open("QUIET_MEDIANS_sf1.json"))
    added = []
    for name in sorted(set(base) & set(sf1)):
        b, s = base[name], sf1[name]
        qm["medians_sec"][name] = {
            "sf1_sec": round(s[0], 3), "sf01_sec": round(b[0], 3),
            "ratio": round(s[0] / b[0], 2) if b[0] else None,
            "out_rows": s[1], "out_rows_base": b[1]}
        added.append(name)
    qm_note = (" r12 extension: the late-r11 queries "
               "(t29/t30/m6/st14/d13) plus the r12 families (label "
               "index, span index, d9 guard, ANN recall, post-swap "
               "d5/d5b) measured with the same protocol (6-query "
               "chunks; noisy entries re-measured in single-query "
               "JVMs).")
    # Idempotent (advisor finding): append the provenance sentence only
    # on a run that actually added entries, and only once.
    if added and qm_note not in qm["what"]:
        qm["what"] += qm_note
    json.dump(qm, open("QUIET_MEDIANS_sf1.json", "w"), indent=1)
    print("QUIET_MEDIANS_sf1.json +", len(added), added)

    # SCALE_CURVE: min-of-reps estimator (the file's documented choice).
    b3 = layered([p for p in [base_p, ov[0]] if p], "min")
    t3 = layered([p for p in [sf1_p, ov[1]] if p], "min")
    x3 = layered([p for p in [sf3_p, ov[2]] if p], "min")
    sc = json.load(open("SCALE_CURVE.json"))
    added = []
    for name in sorted(set(b3) & set(t3) & set(x3)):
        if name in sc["queries"]:
            continue  # keep the r11 measurements for already-covered queries
        e = {
            "sec_1x": round(b3[name][0], 3),
            "sec_10x": round(t3[name][0], 3),
            "sec_30x": round(x3[name][0], 3),
            "rows_1x": b3[name][1], "rows_10x": t3[name][1],
            "rows_30x": x3[name][1],
            "ratio_10x": round(t3[name][0] / b3[name][0], 2),
            "ratio_30x": round(x3[name][0] / b3[name][0], 2),
            "step_30x_over_10x": round(x3[name][0] / t3[name][0], 2),
        }
        sc["queries"][name] = e
        added.append(name)
    sc_note = (" r12 additions: label-index family (d7b/d12b/d13b/"
               "curation_idx/d7c), span-index ingest (t29b), d9 clique "
               "guard (d9b/degree_stats), ANN recall instrumentation, "
               "post-sorted-intersect d5/d5b; same corpora, same "
               "min-of-reps estimator, 6-query chunks.")
    if added and sc_note not in sc["what"]:
        sc["what"] += sc_note
    json.dump(sc, open("SCALE_CURVE.json", "w"), indent=1)
    print("SCALE_CURVE.json +", len(added), added)


if __name__ == "__main__":
    main()
