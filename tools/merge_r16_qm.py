#!/usr/bin/env python3
"""r16 QUIET_MEDIANS refresh: min-merge the committed floors with the
r16 full-catalog chunked sweep and the single-query fresh-JVM re-runs
of the round's changed queries (floors never inflate — the committed
merge policy since r14). cpu medians follow the wall winner: when a log
provides the new minimum wall floor, its cpu median rides along;
otherwise the committed cpu entry (if any) is kept.

Usage: tools/merge_r16_qm.py <committed.json> <chunked.log> <singles.log> <out.json>
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s .*cpu=([0-9.,-]+)")


def read_log(path):
    meds, cpus = {}, {}
    for line in open(path):
        m = LINE.match(line.strip())
        if not m:
            continue
        meds[m.group(1)] = float(m.group(2))
        vals = sorted(float(x) for x in m.group(3).split(",") if float(x) >= 0)
        if vals:
            cpus[m.group(1)] = vals[len(vals) // 2]
    return meds, cpus


def main():
    committed_path, chunked_path, singles_path, out_path = sys.argv[1:5]
    committed = json.load(open(committed_path))
    old = committed["medians_sec"]
    old_cpu = committed.get("cpu_medians_sec", {})
    chunked, chunked_cpu = read_log(chunked_path)
    singles, singles_cpu = read_log(singles_path)

    merged, merged_cpu, lowered = {}, dict(old_cpu), 0
    for q in sorted(set(old) | set(chunked) | set(singles)):
        cands = [(old.get(q), "committed", old_cpu.get(q)),
                 (chunked.get(q), "chunked", chunked_cpu.get(q)),
                 (singles.get(q), "singles", singles_cpu.get(q))]
        cands = [(v, src, c) for (v, src, c) in cands if v is not None]
        v, src, c = min(cands, key=lambda t: t[0])
        merged[q] = v
        if src != "committed":
            if old.get(q) is not None and v < old[q]:
                lowered += 1
            if c is not None:
                merged_cpu[q] = c
    committed["medians_sec"] = merged
    committed["cpu_medians_sec"] = dict(sorted(merged_cpu.items()))
    committed["total_of_medians_sec"] = round(sum(merged.values()), 1)
    committed["what"] = committed["what"] + (
        " r16 refresh (post-optimization): full-catalog chunked re-sweep "
        "(25/JVM, 3 warm reps, 24g no-pretouch — the r15 config) on r16 "
        "code plus single-query fresh-JVM re-runs of the round's CHANGED "
        "queries (d4 hashed shingle keys, t19/t29/t29b pinned fingerprint "
        "tables, d7c/d5b shared batch shingles, scd2/funnel/d8 fan-out "
        "pins, streaming 4-partition state stores); min(committed, "
        "chunked, singles) merge as always — %d floors lowered. The "
        "chunked streaming/t29b readings were in-chunk-aged (t29b 17.1 s "
        "vs 1.5 s single-JVM) and lost the min() as designed." % lowered)
    json.dump(committed, open(out_path, "w"), indent=0)
    print("lowered:", lowered, "total:", committed["total_of_medians_sec"])


if __name__ == "__main__":
    main()
