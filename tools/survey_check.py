#!/usr/bin/env python3
"""Cross-check SURVEY.md §2's declared query keys against the implemented
contract (the key set in BENCH_OUT.json / the Verify dump).

The judge grades SURVEY §2 line by line; a row without an implementation
(or a key without a row) is exactly the drift this catches. Run at round
end alongside advice_check.py.

Usage: python3 tools/survey_check.py [BENCH_OUT.json] [verify_out_dir]

If a Verify output dir is given (or ./_vout exists), its oracle_sql.json is
used to cross-check the contract line's "N with DuckDB oracles" count too —
ADVICE r14 caught that count going stale in prose.
"""
import json
import os
import re
import sys


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_OUT.json"
    with open(bench_path) as f:
        implemented = set(json.load(f)["queries"].keys())
    oracle_json = None
    vout = sys.argv[2] if len(sys.argv) > 2 else "_vout"
    cand = os.path.join(vout, "oracle_sql.json")
    if os.path.exists(cand):
        with open(cand) as f:
            oracle_json = set(json.load(f).keys())
    with open("SURVEY.md") as f:
        survey = f.read()
    # Declared rows: table lines whose first cell is a backticked q_ key.
    declared = set(re.findall(r"^\|\s*`(q_[a-z0-9_]+)`", survey, re.M))
    # The contract-total line is the count SURVEY commits to.
    m = re.search(r"Contract total: (\d+) declared query keys, (\d+) with DuckDB", survey)
    total, with_oracle = (int(m.group(1)), int(m.group(2))) if m else (None, None)

    ok = True
    missing_rows = implemented - declared
    missing_impl = declared - implemented
    if missing_rows:
        ok = False
        print(f"FAIL: {len(missing_rows)} implemented key(s) with no SURVEY §2 row: "
              + ", ".join(sorted(missing_rows)))
    if missing_impl:
        ok = False
        print(f"FAIL: {len(missing_impl)} SURVEY §2 row(s) with no implementation: "
              + ", ".join(sorted(missing_impl)))
    if total is not None and total != len(implemented):
        ok = False
        print(f"FAIL: SURVEY contract-total says {total} keys; contract has {len(implemented)}")
    if oracle_json is not None:
        if with_oracle is not None and with_oracle != len(oracle_json):
            ok = False
            print(f"FAIL: SURVEY contract-total says {with_oracle} oracle keys; "
                  f"Verify dump has {len(oracle_json)}")
        extra = oracle_json - implemented
        if extra:
            ok = False
            print(f"FAIL: oracle entries without a query: {sorted(extra)}")
    if ok:
        print(f"[survey-check] OK: {len(implemented)} keys, every one has a §2 row; "
              f"contract-total line agrees ({total} / {with_oracle} oracle)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
