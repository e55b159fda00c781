"""Print the driver-set rotation: the order `__spark_entry__.queries()`
will present the registry this round, derived from the committed
CORRECTNESS_r*.json artifacts (least-recently-driver-covered first;
see `_driver_rotation_order`). The driver's correctness artifact has
held exactly the first 50 registry entries every round, so the first
50 lines below are the queries that will receive a hard driver row
this round.

Usage: python tools/select_driver_set.py [window]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(entrymod._registry())
    order = entrymod._driver_rotation_order(names)
    # recompute last-seen for display
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    last_seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for k in data:
            last_seen[k] = max(int(m.group(1)), last_seen.get(k, -1))
    print(f"# registry: {len(order)} queries; driver window: {window}")
    for i, n in enumerate(order):
        seen = last_seen.get(n, -1)
        tag = "never" if seen < 0 else f"r{seen:02d}"
        marker = "DRIVER" if i < window else "      "
        print(f"{i + 1:3d} {marker} last={tag:5s} {n}")
    in_window = set(order[:window])
    prev = {k for k, v in last_seen.items() if v == max(last_seen.values())}
    fresh = in_window - prev
    print(f"# window has {len(fresh)} queries absent from the latest artifact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
