"""Repo-hygiene gates (VERDICT r5 item 6): source files must stay
below the monolith threshold so promotion rounds keep dissolving the
query registry into domain modules instead of re-growing one file.
"""

import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "dbt_lakehouse_aws_spark"

#: hard ceiling for any non-test source file (standard_queries.py
#: peaked at 8,477 before the round-6 split; staged_r6.py at 11,268)
MAX_SOURCE_LINES = 6_000


def test_no_source_monoliths():
    offenders = {}
    for p in PKG.rglob("*.py"):
        n = sum(1 for _ in p.open())
        if n > MAX_SOURCE_LINES:
            offenders[str(p.relative_to(PKG))] = n
    assert not offenders, (
        f"files above {MAX_SOURCE_LINES} lines — split into domain "
        f"modules (see queries_r6.py / queries_llm.py): {offenders}"
    )
