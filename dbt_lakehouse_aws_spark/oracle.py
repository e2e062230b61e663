"""Oracle-comparison helpers shared by scripts/check_oracle.py and tests.

Replicates the driver's correctness gate: row count + column-name set
+ order-insensitive value multiset (columns sorted by name, floats
normalized to 6 decimals) between a Spark DataFrame and a DuckDB
relation running the ``oracle_sql()`` string over the same parquet.
"""

from __future__ import annotations

import math


def norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.6f}"
    return str(v)


def frame_to_multiset(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)


def compare_frames(scols, srows, dcols, drows) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"row count spark={len(srows)} oracle={len(drows)}")
    sc = sorted(c.lower() for c in scols)
    dc = sorted(c.lower() for c in dcols)
    if sc != dc:
        problems.append(f"columns spark={sc} oracle={dc}")
    if problems:
        return problems
    sm = frame_to_multiset([c.lower() for c in scols], srows)
    dm = frame_to_multiset([c.lower() for c in dcols], drows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
        problems.append(f"value mismatch, first diffs: {diffs}")
    return problems
