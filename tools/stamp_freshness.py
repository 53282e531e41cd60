"""Driver-stamp freshness report — makes the per-round `_DRIVER_WINDOW`
rotation mechanical (r12 VERDICT lead #1 hygiene).

The driver's correctness gate samples the FIRST 50 registry entries
each round into CORRECTNESS_r{N}.json; `queries._DRIVER_WINDOW`
chooses which 50.  The rotation policy is never-stamped-first, then
oldest-stamp-first in registry order.  This tool computes, from the
committed CORRECTNESS artifacts:

- the newest stamp per query and the stamp histogram,
- queries that have NEVER been stamped,
- a ready-to-paste suggestion for the next round's window.

Usage: python tools/stamp_freshness.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stamps() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            newest[q] = max(newest.get(q, 0), r)
    return newest


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from nosql_join_stream_spark.queries import REGISTRY
    names = list(REGISTRY)
    st = stamps()
    never = [n for n in names if n not in st]
    hist: dict[int, int] = {}
    for n in names:
        if n in st:
            hist[st[n]] = hist.get(st[n], 0) + 1
    print(f"registry: {len(names)} queries; stamped: {len(names) - len(never)}")
    print("stamp histogram:", dict(sorted(hist.items())))
    print(f"never stamped ({len(never)}):", never)
    # suggestion: never-stamped first, then ascending stamp, registry order
    ranked = sorted(names, key=lambda n: (st.get(n, -1), names.index(n)))
    window = ranked[:size]
    print(f"\nsuggested next window ({size}):")
    for n in window:
        print(f'    "{n}",  # stamp '
              + (f"r{st[n]}" if n in st else "never"))


if __name__ == "__main__":
    main()
