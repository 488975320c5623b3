"""Registry staleness report (VERDICT r6 ask #2): for every queries()
entry, the last round whose driver CORRECTNESS_r*.json contains it.
The gate only hash-checks the first 50 registry entries per round, so
the window must rotate until no row is more than ~3 rounds stale —
this table is the rotation's evidence and its planning input.

Usage: python scripts/staleness.py [round_about_to_run]
Prints a markdown section for NOTES.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    cur = int(sys.argv[1]) if len(sys.argv) > 1 else None
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for k in json.load(open(path)):
            last[k] = max(last.get(k, 0), rnd)
    names = list(entry_mod.queries())
    if cur is not None:
        # the upcoming gate will check the first 50 rows
        for n in names[:50]:
            last[n] = cur
    by_round: dict[int, list[str]] = {}
    for n in names:
        by_round.setdefault(last.get(n, 0), []).append(n)
    print("### Registry staleness (last driver-checked round per entry)")
    print()
    total = len(names)
    print(f"| last checked | entries | names |")
    print(f"|---|---|---|")
    for rnd in sorted(by_round):
        rows = by_round[rnd]
        label = f"r{rnd}" if rnd else "never"
        print(f"| {label} | {len(rows)} | {', '.join(rows)} |")
    print()
    print(f"Total registry entries: {total}. Gate window = first 50.")


if __name__ == "__main__":
    main()
