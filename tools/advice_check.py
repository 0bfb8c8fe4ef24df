#!/usr/bin/env python3
"""Round-end ADVICE.md hygiene gate (VERDICT r12 "What's wrong" #1: twice
now a round shipped ADVICE.md listing findings that were already fixed,
sending the next round chasing closed items).

Every finding bullet (`- **sev** path:line — ...`) must carry a
disposition annotation — a line inside the bullet containing one of:

    [FIXED r<N>: <how/where>]
    [WONTFIX r<N>: <why>]
    [DEFERRED r<N>: <tracking note>]

Exit 1 listing any bullet without one. Run this before the round-end
commit; the driver replaces ADVICE.md with fresh advisor output next
round, so annotations never need to survive beyond the round that makes
them.

Usage: python3 tools/advice_check.py [ADVICE.md]
"""
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "ADVICE.md"
    try:
        text = open(path, encoding="utf-8").read()
    except FileNotFoundError:
        print(f"[advice-check] {path} not found — nothing to gate")
        return 0
    # Split into top-level bullets ("- **sev** ..."), each of which may span
    # continuation lines (indented `_remedy_` lines, annotations).
    bullets = re.split(r"(?m)^(?=- \*\*)", text)
    findings = [b for b in bullets if b.startswith("- **")]
    if not findings:
        print(f"[advice-check] {path}: no finding bullets — clean")
        return 0
    marker = re.compile(r"\[(FIXED|WONTFIX|DEFERRED) r\d+:")
    open_items = [b for b in findings if not marker.search(b)]
    for b in open_items:
        head = b.splitlines()[0]
        print(f"[advice-check] UNANNOTATED: {head[:120]}")
    if open_items:
        print(f"[advice-check] {len(open_items)}/{len(findings)} finding(s) "
              "lack a [FIXED/WONTFIX/DEFERRED rN: ...] annotation — "
              "annotate before the round-end commit")
        return 1
    print(f"[advice-check] {path}: all {len(findings)} finding(s) annotated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
