#!/usr/bin/env python3
"""Re-adjudicate per-query reference times from fresh quiet Bench runs.

The guard (bench_guard.py) compares candidate runs against per-query
ADJUDICATED minimums. When a query's implementation changes, its reference
entry must be REPLACED from fresh quiet runs — folding a min across
implementations would keep a stale-low number from the old code and flag the
new code forever; conversely a stale-low entry makes the guard cry wolf.

Usage:
  python3 tools/bench_adjudicate.py --ref tools/bench_reference.json \
      --replace q_stream_ q_agg_incremental q_text_tfidf -- run1.json run2.json ...

Every key matching a --replace prefix gets reference := min over the given
runs; keys present in runs but absent from the reference (new queries) are
added the same way. All other keys keep their existing adjudicated entry.
The reference total is recomputed as the sum of entries.
"""
import json
import sys


def main():
    args = sys.argv[1:]
    ref_path = "tools/bench_reference.json"
    prefixes = []
    runs = []
    it = iter(range(len(args)))
    i = 0
    mode = None
    for a in args:
        if a == "--ref":
            mode = "ref"
        elif a == "--replace":
            mode = "replace"
        elif a == "--":
            mode = "runs"
        elif mode == "ref":
            ref_path = a
            mode = None
        elif mode == "replace":
            prefixes.append(a)
        elif mode == "runs":
            runs.append(a)
    if not runs:
        print(__doc__)
        return 2

    with open(ref_path) as f:
        ref = json.load(f)
    run_docs = []
    for r in runs:
        with open(r) as f:
            doc = json.load(f)
        if doc.get("errors"):
            print(f"REFUSED: {r} has failed queries {doc['errors']}")
            return 1
        run_docs.append(doc["queries"])

    fresh_min = {}
    for q in set().union(*run_docs):
        vals = [d[q] for d in run_docs if q in d]
        if len(vals) != len(run_docs):
            print(f"REFUSED: {q} missing from some runs — adjudicate from "
                  "full runs only")
            return 1
        fresh_min[q] = round(min(vals), 3)

    replaced, added = [], []
    for q, v in sorted(fresh_min.items()):
        is_target = any(q.startswith(p) for p in prefixes)
        if q not in ref["queries"]:
            ref["queries"][q] = v
            added.append(q)
        elif is_target:
            old = ref["queries"][q]
            ref["queries"][q] = v
            replaced.append(f"{q}: {old} -> {v}")

    ref["value"] = round(sum(ref["queries"].values()), 2)
    with open(ref_path, "w") as f:
        json.dump(ref, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"runs: {len(run_docs)}, replaced {len(replaced)}, added {len(added)}; "
          f"new total {ref['value']}s")
    for line in replaced:
        print("  " + line)
    for q in added:
        print(f"  + {q}: {ref['queries'][q]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
