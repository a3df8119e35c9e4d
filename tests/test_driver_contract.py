"""Driver-contract insurance (no Ray session needed): the registry
keys the driver depends on must never drift.

The per-round driver imports ``__ray_entry__`` and compares
``queries()`` against ``oracle_sql()`` side-by-side; its CORRECTNESS
gate samples a FIXED 50-key subset. A renamed or dropped registry key
silently turns a green gate row into an error row, so this test pins:

1. every oracle_sql() key has a queries() callable,
2. the frozen 50-key driver subset (CORRECTNESS_r04.json) is present
   with oracle SQL for each,
3. entry()'s flagship key exists,
4. keys are unique/non-empty strings and callables are callable.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver's fixed CORRECTNESS sample (CORRECTNESS_r04.json keys).
# Frozen HERE as well so a registry rename fails fast in the suite
# instead of first surfacing in the next round's driver gate.
_DRIVER_SUBSET_SNAPSHOT = os.path.join(REPO, "CORRECTNESS_r04.json")


def _registry():
    import sys
    sys.path.insert(0, REPO)
    import __ray_entry__ as e
    return e


class TestDriverContract:
    def test_oracle_keys_subset_of_queries(self):
        e = _registry()
        q, o = e.queries(), e.oracle_sql()
        missing = sorted(set(o) - set(q))
        assert not missing, f"oracle_sql keys without queries: {missing}"

    def test_frozen_driver_subset_still_registered(self):
        e = _registry()
        q, o = e.queries(), e.oracle_sql()
        with open(_DRIVER_SUBSET_SNAPSHOT) as f:
            driver_keys = sorted(json.load(f))
        assert len(driver_keys) == 50
        gone = [k for k in driver_keys if k not in q]
        assert not gone, f"driver CORRECTNESS keys missing: {gone}"
        # every sampled key ran with a full oracle last round; losing
        # the SQL twin downgrades it to a weaker rows-only check
        downgraded = [k for k in driver_keys if k not in o]
        assert not downgraded, \
            f"driver CORRECTNESS keys lost their SQL twin: {downgraded}"

    def test_flagship_and_shape(self):
        e = _registry()
        q, o = e.queries(), e.oracle_sql()
        assert "crawl_flagship" in q
        assert all(isinstance(k, str) and k for k in q)
        assert all(callable(v) for v in q.values())
        assert all(isinstance(s, str) and "SELECT" in s.upper()
                   for s in o.values())
