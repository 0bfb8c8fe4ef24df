#!/usr/bin/env python3
"""Contention guard for bench artifacts.

Host contention has repeatedly inflated committed bench numbers (a run that
overlaps another heavy process can read 1.4x+ slower across the board and
manufacture fake per-query regressions). Before committing a BENCH file,
compare it against the freshest *adjudicated* reference times: if the total
or a majority of shared queries are >=2x the reference, the run is suspect —
re-run once on a quiet host and commit the saner result.

Usage: python3 tools/bench_guard.py <candidate.json> [reference.json]

The reference defaults to tools/bench_reference.json (adjudicated per-query
times). Suspect = any failed query, total >=1.3x the reference, or >=max(3,
10% of shared queries) individually inflated >=2x. Exit 0 = looks clean;
exit 1 = suspect, re-run before committing.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    return doc["value"], doc["queries"], doc.get("errors", [])


def main():
    cand_path = sys.argv[1]
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_reference.json"
    cand_total, cand_q, cand_errors = load(cand_path)
    ref_total, ref_q, _ = load(ref_path)

    if cand_errors:
        # A failed query records a near-zero time, which DEFLATES the total —
        # the ratio checks below cannot be trusted, and the artifact is
        # broken regardless of contention.
        print(f"SUSPECT: candidate has failed queries: {cand_errors}")
        return 1

    shared = sorted(set(cand_q) & set(ref_q))
    inflated = [q for q in shared if ref_q[q] >= 0.2 and cand_q[q] >= 2 * ref_q[q]]
    total_ratio = cand_total / ref_total if ref_total else float("inf")

    print(f"total: candidate {cand_total:.2f}s vs reference {ref_total:.2f}s "
          f"({total_ratio:.2f}x), shared queries: {len(shared)}")
    for q in inflated:
        print(f"  inflated >=2x: {q}: {cand_q[q]:.2f}s vs {ref_q[q]:.2f}s")

    suspect = total_ratio >= 1.3 or len(inflated) >= max(3, len(shared) // 10)
    if suspect:
        print("SUSPECT: contention-inflated run — re-run Bench on a quiet host "
              "and compare again before committing.")
        return 1
    print("OK: within contention tolerance of the adjudicated reference.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
