#!/usr/bin/env python3
"""Fold the r13 sweep logs into QUIET_MEDIANS_sf1.json and SCALE_CURVE.json
WITHOUT dropping prior-round entries (the raw TIME logs behind older rounds
live in /tmp and don't survive the host). Dev tool.

Usage: tools/merge_r13_scale.py <baseLog> <sf1Log> [sf3Log]

r13 batch: the 8 catalog queries that had NO sf1 datapoint after r12
(m9_png_meta, q_curation_neardup, q_triangles_adj_idx,
q_triangles_adj_ingest, sim_ivf_idx, sim_ivf_ingest, sim_ivf_recall_idx,
t28_bpe_encode), measured base (sf01m) + 10x (sf1) in single-query fresh
JVMs; the new index/ingest families additionally at 30x (sf3) for the
scale curve. Ratios are same-host pairs, so host drift cancels.
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


def main():
    base_p, sf1_p = sys.argv[1:3]
    sf3_p = sys.argv[3] if len(sys.argv) > 3 else None

    base = parse(base_p, "median")
    sf1 = parse(sf1_p, "median")
    qm = json.load(open("QUIET_MEDIANS_sf1.json"))
    added = []
    for name in sorted(set(base) & set(sf1)):
        b, s = base[name], sf1[name]
        qm["medians_sec"][name] = {
            "sf1_sec": round(s[0], 3), "sf01_sec": round(b[0], 3),
            "ratio": round(s[0] / b[0], 2) if b[0] else None,
            "out_rows": s[1], "out_rows_base": b[1]}
        added.append(name)
    qm_note = (" r13 extension: the 8 queries with no prior sf1 datapoint "
               "(m9/q_curation_neardup/q_triangles_adj_idx/t28 plus the new "
               "IVF-index and triangle-ingest families), single-query fresh "
               "JVMs, 3 warm reps; measured on the r13 host (slower than "
               "the r10/r12 sweeps' host state - cross-round ABSOLUTE "
               "comparisons are invalid, same-host RATIOS are the signal).")
    if added and qm_note not in qm["what"]:
        qm["what"] += qm_note
    json.dump(qm, open("QUIET_MEDIANS_sf1.json", "w"), indent=1)
    print("QUIET_MEDIANS_sf1.json +", len(added), added)

    if sf3_p is None:
        return
    b3 = parse(base_p, "min")
    t3 = parse(sf1_p, "min")
    x3 = parse(sf3_p, "min")
    sc = json.load(open("SCALE_CURVE.json"))
    added = []
    for name in sorted(set(b3) & set(t3) & set(x3)):
        if name in sc["queries"]:
            continue  # keep prior-round measurements for covered queries
        sc["queries"][name] = {
            "sec_1x": round(b3[name][0], 3),
            "sec_10x": round(t3[name][0], 3),
            "sec_30x": round(x3[name][0], 3),
            "rows_1x": b3[name][1], "rows_10x": t3[name][1],
            "rows_30x": x3[name][1],
            "ratio_10x": round(t3[name][0] / b3[name][0], 2),
            "ratio_30x": round(x3[name][0] / b3[name][0], 2),
            "step_30x_over_10x": round(x3[name][0] / t3[name][0], 2),
        }
        added.append(name)
    sc_note = (" r13 additions: IVF stored-index family (sim_ivf_idx/"
               "ingest/recall_idx), triangle incremental ingest "
               "(q_triangles_adj_ingest), PNG chunk walk (m9); same "
               "corpora, min-of-reps estimator, single-query fresh JVMs; "
               "r13 host (see QUIET_MEDIANS_sf1 note on host drift).")
    if added and sc_note not in sc["what"]:
        sc["what"] += sc_note
    json.dump(sc, open("SCALE_CURVE.json", "w"), indent=1)
    print("SCALE_CURVE.json +", len(added), added)


if __name__ == "__main__":
    main()
