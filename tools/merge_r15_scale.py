#!/usr/bin/env python3
"""Build the r15 full-catalog scale artifacts from the probe-gated
base/sf1 sweep logs (VERDICT r14 #2 — the r10 174-query SCALE_SF1_FULL
lagged the catalog by 33 queries and several rounds of engine changes).

Usage: tools/merge_r15_scale.py <baseLog> <sf1Log>

Writes SCALE_SF1_FULL.json (full catalog, replacing the r10 artifact)
and refreshes QUIET_MEDIANS_sf1.json's medians_sec wholesale (same
sweep, same estimator). Estimator: MIN of warm reps — the established
protocol on this host, whose in-JVM rep escalation can poison medians
while the min is always an honestly completed measurement; the cpu=
columns in the logs are the audit trail. Dev tool.
"""
import json
import re
import sys

LINE = re.compile(r"^TIME (\S+)\s+median=\s*([0-9.]+) s\s+reps=([0-9.,]+)\s+rows=(\d+)")
FLAG_RATIO = 4.0


def parse(path):
    out = {}
    for line in open(path):
        m = LINE.match(line.strip())
        if m:
            out[m.group(1)] = (min(float(x) for x in m.group(3).split(",")),
                               int(m.group(4)))
    return out


def main():
    base_p, sf1_p = sys.argv[1], sys.argv[2]
    base, sf1 = parse(base_p), parse(sf1_p)
    names = sorted(set(base) & set(sf1))
    queries, flagged = {}, []
    for n in names:
        b, s = base[n], sf1[n]
        ratio = round(s[0] / b[0], 2) if b[0] else None
        queries[n] = {
            "base_sec": round(b[0], 3), "base_rows": b[1],
            "scaled_sec": round(s[0], 3), "scaled_rows": s[1],
            "ratio": ratio,
            "rows_ratio": round(s[1] / b[1], 2) if b[1] else None,
        }
        if ratio is not None and ratio > FLAG_RATIO:
            flagged.append(n)
    top = sorted(names, key=lambda n: -(queries[n]["ratio"] or 0))[:8]
    what = (
        "FULL-CATALOG (%d-query) sf1 scale sweep, r15 — regenerated on "
        "post-mix64-hash-bank, post-winnow-prechunk code (VERDICT r14 #2; "
        "replaces the r10 174-query artifact). base = /tmp/sf01m (ScaleUp "
        "replicas=1 re-layout), scaled = /tmp/sf1 (ScaleUp x10: "
        "referential-integrity key remap, per-replica document suffix so "
        "replicas are NEAR-dups — the adversarial case for the dedup "
        "families). Protocol: probe-gated chunks (2 GB pretouch < 1.5 s "
        "before EVERY chunk; zero retries needed on either sweep), fresh "
        "JVM per <=25-query chunk, the 18 pollution-class queries "
        "(Bench.FreshJvmQueries) single-query self-warmed; 24g pinned "
        "heap, no AlwaysPreTouch (SURVEY 7.8 protocol note); estimator = "
        "MIN of 2 warm reps after an untimed self-warm-up. ratio = "
        "sf1/base wall at 10x rows; sub-second queries sit at the "
        "fresh-JVM fixed-cost floor so their ratios cluster near 1." % len(names))
    out = {
        "what": what,
        "base_log": base_p, "scaled_log": sf1_p,
        "flag_ratio": FLAG_RATIO,
        "n_queries": len(names),
        "flagged": flagged,
        "queries": queries,
        "headline": {n: queries[n]["ratio"] for n in top},
    }
    json.dump(out, open("SCALE_SF1_FULL.json", "w"), indent=1)
    print("SCALE_SF1_FULL.json:", len(names), "queries;",
          len(flagged), "flagged >%sx:" % FLAG_RATIO, flagged)

    qm = json.load(open("QUIET_MEDIANS_sf1.json"))
    qm["medians_sec"] = {
        n: {"sf1_sec": queries[n]["scaled_sec"], "sf01_sec": queries[n]["base_sec"],
            "ratio": queries[n]["ratio"], "out_rows": queries[n]["scaled_rows"],
            "out_rows_base": queries[n]["base_rows"]}
        for n in names}
    qm["what"] = (
        "Full-catalog sf1 medians, r15 wholesale refresh from the same "
        "probe-gated sweep as SCALE_SF1_FULL.json (see its 'what' for the "
        "protocol) — every stale-row annotation from r13b/r14 is obsolete: "
        "all entries now measure post-mix64, post-prechunk code.")
    qm["flagged_over_4x"] = flagged
    json.dump(qm, open("QUIET_MEDIANS_sf1.json", "w"), indent=1)
    print("QUIET_MEDIANS_sf1.json refreshed:", len(names), "entries")


if __name__ == "__main__":
    main()
