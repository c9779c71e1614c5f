#!/usr/bin/env python3
"""Assemble QUIET_MEDIANS.json (full-catalog sf0.1 warm medians) from
sweep logs. Dev/driver-side only.

Usage: tools/build_qm.py <outJson> <whatText> <log> [...more logs]

Later logs override earlier ones per query (re-measurement protocol:
chunked sweep first, then single-query fresh-JVM re-runs for any query
whose chunked reps were noisy).
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s .*rows=(\d+)")
CPU = re.compile(r"cpu=([0-9.,-]+)")


def main():
    out_json, what = sys.argv[1], sys.argv[2]
    meds = {}
    cpus = {}
    # A .json input seeds from a previously built QUIET_MEDIANS file, so
    # an incremental round only re-sweeps its NEW queries (the raw TIME
    # logs behind older rounds live in /tmp and don't survive the host).
    for path in sys.argv[3:]:
        if path.endswith(".json"):
            meds.update(json.load(open(path)).get("medians_sec", {}))
            continue
        for line in open(path):
            m = LINE.match(line.strip())
            if m:
                meds[m.group(1)] = float(m.group(2))
                c = CPU.search(line)
                if c:
                    # median of the per-rep process-CPU deltas (r14:
                    # TimeQuery appends cpu=...; lets a reader separate
                    # host stall from real work per entry). -1.0 is the
                    # 'platform bean unavailable' sentinel, not a
                    # measurement — drop it before taking the median
                    # (advisor finding r14), and omit the entry when no
                    # valid rep remains.
                    vals = sorted(float(x) for x in c.group(1).split(",")
                                  if float(x) >= 0)
                    if vals:
                        cpus[m.group(1)] = vals[len(vals) // 2]
    report = {
        "what": what,
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "n_queries": len(meds),
        "total_of_medians_sec": round(sum(meds.values()), 1),
        "medians_sec": {k: meds[k] for k in sorted(meds)},
    }
    if cpus:
        report["cpu_medians_sec"] = {k: cpus[k] for k in sorted(cpus)}
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"wrote {out_json}: {len(meds)} queries, "
          f"sum {report['total_of_medians_sec']} s")


if __name__ == "__main__":
    main()
