#!/usr/bin/env python3
"""Merge two sweep_quiet.sh logs (baseline scale + scaled corpus) into a
ratio report JSON. Dev tool, driver-side python only.

Usage: tools/merge_sweep.py <baseLog> <scaledLog> <outJson> [flagRatio] [notesJson]

Parses `TIME <name> median= <sec> s ... rows=<n>` lines emitted by
graft.tools.TimeQuery; ratio = scaled/base per query; queries with ratio
above flagRatio (default 4.0) land in the "flagged" list. Logs may
concatenate several sweep runs — a later TIME line for the same query
overrides an earlier one (re-measurement protocol). notesJson maps query
name -> attribution string, attached to that query's entry; every flagged
query without a note is reported so no >flag ratio ships unexplained.
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s .*rows=(\d+)")


def parse(path):
    out = {}
    for line in open(path):
        m = LINE.match(line.strip())
        if m:
            out[m.group(1)] = (float(m.group(2)), int(m.group(3)))
        elif line.startswith("CHUNKFAIL"):
            print(f"WARNING: failed chunk in {path}: {line.strip()}", file=sys.stderr)
    return out


def main():
    base_log, scaled_log, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    flag = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0
    notes = json.load(open(sys.argv[5])) if len(sys.argv) > 5 else {}
    base, scaled = parse(base_log), parse(scaled_log)
    queries = {}
    for name in sorted(set(base) | set(scaled)):
        b, s = base.get(name), scaled.get(name)
        entry = {}
        if b:
            entry["base_sec"], entry["base_rows"] = b
        if s:
            entry["scaled_sec"], entry["scaled_rows"] = s
        if b and s and b[0] > 0:
            entry["ratio"] = round(s[0] / b[0], 2)
            if b[1] > 0:
                entry["rows_ratio"] = round(s[1] / b[1], 2)
        if name in notes:
            entry["note"] = notes[name]
        queries[name] = entry
    flagged = sorted(
        (n for n, e in queries.items() if e.get("ratio", 0) > flag),
        key=lambda n: -queries[n]["ratio"])
    unexplained = [n for n in flagged if "note" not in queries[n]]
    if unexplained:
        print(f"WARNING: flagged without attribution note: "
              f"{', '.join(unexplained)}", file=sys.stderr)
    report = {
        "what": ("per-query warm medians (tools/sweep_quiet.sh: TimeQuery, "
                 "fresh JVM per chunk), ratio = scaled/base wall-clock"),
        "base_log": base_log,
        "scaled_log": scaled_log,
        "flag_ratio": flag,
        "n_queries": len(queries),
        "flagged": flagged,
        "queries": queries,
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_json}: {len(queries)} queries, {len(flagged)} flagged "
          f"(> {flag}x): {', '.join(flagged) or 'none'}")


if __name__ == "__main__":
    main()
