"""Round-6 STAGED queries — implemented after the round-5 driver
window froze, NOT yet in ``queries()``.

Same discipline as round 4's staging (VERDICT r3 item 3: zero
registered-but-unwindowed queries at round end): anything built after
the freeze lives here with its oracle, pytest-verified every session
by ``tests/test_staged_r6.py``, then moves into the registry with a
plain ``@register`` when round 6 opens.
"""

from __future__ import annotations

#: name → oracle SQL, mirrors standard_queries' registry shape
STAGED_ORACLES: dict[str, str] = {}
#: name → (spark, sf_dir) -> DataFrame
STAGED_QUERIES: dict[str, object] = {}


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED_ORACLES[name] = oracle
        STAGED_QUERIES[name] = fn
        return fn

    return deco
