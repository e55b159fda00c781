"""Driver-set rotation (__spark_entry__._driver_rotation_order): the
registry must surface least-recently-driver-covered queries first so
the driver's 50-row CORRECTNESS artifact reaches every query within
~ceil(registry/50) rounds (round-4 VERDICT #2)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def test_rotation_preserves_registry_and_orders_uncovered_first():
    reg = list(entrymod._registry())
    order = list(entrymod.queries())
    assert sorted(order) == sorted(reg)  # a permutation, nothing lost
    # deterministic
    assert order == list(entrymod.queries())
    # recompute coverage the same way the rotation does
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    last_seen = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        with open(path) as fh:
            for k in json.load(fh):
                last_seen[k] = max(int(m.group(1)), last_seen.get(k, -1))
    if not last_seen:
        return  # fresh clone without artifacts: order == registry order
    keys = [last_seen.get(n, -1) for n in order]
    assert keys == sorted(keys)  # monotone: least-recently-covered first
    # every never-covered query outranks every covered one
    n_uncovered = sum(1 for n in reg if n not in last_seen)
    assert all(n not in last_seen for n in order[:n_uncovered])


def test_rotation_window_refreshes_driver_artifact():
    """With >50 uncovered queries (the round-5 state), the first 50 —
    the driver's window — must all be absent from the latest
    artifact."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    arts = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)),
    )
    if not arts:
        return
    with open(arts[-1]) as fh:
        latest = set(json.load(fh))
    order = list(entrymod.queries())
    uncovered_total = [n for n in order if n not in latest]
    window = order[:50]
    fresh = [n for n in window if n not in latest]
    # at least min(50, uncovered) fresh queries enter the driver window
    assert len(fresh) >= min(50, len(uncovered_total))
