#!/usr/bin/env python3
"""Fold the r14 refresh sweeps into QUIET_MEDIANS_sf1.json and
SCALE_CURVE.json, REPLACING the stale minhash-band-family rows
(pre-int64-signature, flagged in both files' r13b annotations) and the
reworked sim_lsh_sweep / new t19b_dup_spans_idx rows. Dev tool.

Usage: tools/merge_r14_scale.py <baseLog> <sf1Log> [sf3Log]

Estimator: MIN of warm reps (the SCALE_CURVE protocol) for BOTH
artifacts this round — the r14 host exhibits the in-JVM rep-escalation
pathology (SURVEY 7.6: rep-over-rep real-CPU inflation, e.g. d7 reps
7.4/7.0/85.1 with cpu 93/91/1084 s), so a median can land on a poisoned
rep while the min is always an honestly-completed measurement. The
TIME lines' cpu= column (r14) is the evidence trail.
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s\s+reps=([0-9.,]+)\s+rows=(\d+)")


def parse(path):
    out = {}
    for line in open(path):
        m = LINE.match(line.strip())
        if not m:
            continue
        reps = [float(x) for x in m.group(3).split(",")]
        out[m.group(1)] = (min(reps), int(m.group(4)))
    return out


STALE_QM = " r13b note: the minhash-band family's entries (d2/d5/d5b/d7/d7c/d12/d13/q_curation_neardup/st14) predate the int64-signature change (commit 2fe734c) and are STALE IN THE CONSERVATIVE direction - a same-host A/B (one query per JVM, median of 3, 10x corpus) measured d2 4.44 -> 3.48 s and d7 14.97 -> 11.38 s after the change, flat at sf0.1; a refresh sweep was aborted because the host had entered its degraded fault-storm state and would have replaced good-host absolutes with junk."


def main():
    base_p, sf1_p = sys.argv[1:3]
    sf3_p = sys.argv[3] if len(sys.argv) > 3 else None

    base = parse(base_p)
    sf1 = parse(sf1_p)
    qm = json.load(open("QUIET_MEDIANS_sf1.json"))
    replaced = []
    for name in sorted(set(base) & set(sf1)):
        b, s = base[name], sf1[name]
        qm["medians_sec"][name] = {
            "sf1_sec": round(s[0], 3), "sf01_sec": round(b[0], 3),
            "ratio": round(s[0] / b[0], 2) if b[0] else None,
            "out_rows": s[1], "out_rows_base": b[1]}
        replaced.append(name)
    qm["what"] = qm["what"].replace(STALE_QM, "")
    qm_note = (" r14 refresh: the minhash-band family (the rows the r13b "
               "note flagged stale), the reworked sim_lsh_sweep, and the "
               "new t19b_dup_spans_idx re-measured base+10x on "
               "post-int64-signature, post-r14-CC-loop code; single-query "
               "fresh JVMs, warm MIN of 3 reps (this host's in-JVM "
               "rep-escalation pathology poisons medians - the cpu= "
               "column in the sweep logs is the evidence; ratios are "
               "same-session pairs, so host drift cancels).")
    if replaced and qm_note not in qm["what"]:
        qm["what"] += qm_note
    json.dump(qm, open("QUIET_MEDIANS_sf1.json", "w"), indent=1)
    print("QUIET_MEDIANS_sf1.json refreshed:", len(replaced), replaced)

    if sf3_p is None:
        return
    x3 = parse(sf3_p)
    sc = json.load(open("SCALE_CURVE.json"))
    refreshed = []
    for name in sorted(set(base) & set(sf1) & set(x3)):
        sc["queries"][name] = {
            "sec_1x": round(base[name][0], 3),
            "sec_10x": round(sf1[name][0], 3),
            "sec_30x": round(x3[name][0], 3),
            "rows_1x": base[name][1], "rows_10x": sf1[name][1],
            "rows_30x": x3[name][1],
            # Zero guard (advisor finding r14): a 0.000 min rep must
            # yield null ratios, not a ZeroDivisionError mid-merge —
            # same contract as the QUIET_MEDIANS path.
            "ratio_10x": (round(sf1[name][0] / base[name][0], 2)
                          if base[name][0] else None),
            "ratio_30x": (round(x3[name][0] / base[name][0], 2)
                          if base[name][0] else None),
            "step_30x_over_10x": (round(x3[name][0] / sf1[name][0], 2)
                                  if sf1[name][0] else None),
        }
        refreshed.append(name)
    sc_note = (" r14 refresh: minhash-band family + sim_lsh_sweep + "
               "t19b_dup_spans_idx re-measured at 1x/10x/30x on "
               "post-int64-signature, post-r14-CC-loop code (same "
               "min-of-reps estimator; r14 host - same-session ratios are "
               "the signal).")
    if refreshed and sc_note not in sc["what"]:
        sc["what"] += sc_note
    json.dump(sc, open("SCALE_CURVE.json", "w"), indent=1)
    print("SCALE_CURVE.json refreshed:", len(refreshed), refreshed)


if __name__ == "__main__":
    main()
