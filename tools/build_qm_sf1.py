#!/usr/bin/env python3
"""Assemble QUIET_MEDIANS_sf1.json from sweep logs. Dev/driver-side only.

Usage: tools/build_qm_sf1.py <outJson> <baseLog> <sf1Log> [...more log pairs]

Later logs override earlier ones per query (re-measurement protocol:
chunked sweep first, then single-query fresh-JVM re-runs for any query
whose chunked reps were noisy). Logs alternate base,scaled,base,scaled...
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s .*rows=(\d+)")


def parse_into(path, out):
    for line in open(path):
        m = LINE.match(line.strip())
        if m:
            out[m.group(1)] = (float(m.group(2)), int(m.group(3)))


def main():
    out_json = sys.argv[1]
    logs = sys.argv[2:]
    base, scaled = {}, {}
    for i, path in enumerate(logs):
        parse_into(path, base if i % 2 == 0 else scaled)
    queries = {}
    for name in sorted(set(base) & set(scaled)):
        b, s = base[name], scaled[name]
        queries[name] = {
            "sf1_sec": round(s[0], 3),
            "sf01_sec": round(b[0], 3),
            "ratio": round(s[0] / b[0], 2),
            "out_rows": s[1],
            "out_rows_base": b[1],
        }
    report = {
        "what": ("tools/sweep_quiet.sh warm medians (TimeQuery, fresh JVM per "
                 "chunk; noisy queries re-measured in single-query JVMs with 5 "
                 "reps) for the heavy set. base = /tmp/sf01m (tools/ScaleUp "
                 "replicas=1: the sf0.1 fixture re-laid-out as ~32 files per "
                 "table, so base and x10 share the same file layout and the "
                 "ratio isolates DATA growth, not the single-file fixture's "
                 "serialization artifact). scaled = /tmp/sf1 (ScaleUp x10, "
                 "key-remapped, documents near-duplicated per replica). "
                 "ratio = sf1/base wall-clock at 10x rows; out_rows vs "
                 "out_rows_base shows where OUTPUT growth (dedup families' "
                 "pair counts grow ~20-970x by corpus construction) explains "
                 "a super-unit ratio."),
        "sf": "/tmp/sf1 (ScaleUp of /root/testdata/sf0.1 x10)",
        "cpus": 32,
        "medians_sec": queries,
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"wrote {out_json}: {len(queries)} queries")
    for n, e in sorted(queries.items(), key=lambda kv: -kv[1]["ratio"]):
        print(f"  {n:24s} ratio={e['ratio']:5} base={e['sf01_sec']:7.3f} "
              f"sf1={e['sf1_sec']:7.3f} rows={e['out_rows']}")


if __name__ == "__main__":
    main()
