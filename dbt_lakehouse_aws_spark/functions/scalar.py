"""Scalar-function surface (SURVEY §2.8) — the complete set of SQL
functions the reference uses, as Spark Column expressions.

Every entry cites where the reference uses it; most are direct
built-ins (re-exported here so the parity mapping is explicit and
testable), a few need a small wrapper to match Trino semantics
exactly. All run inside whole-stage codegen.

| reference (Trino)         | here                     | cited usage |
|---------------------------|--------------------------|-------------|
| regexp_extract(s,p,g)     | F.regexp_extract         | src_*.sql:8-13 |
| concat(a,b,…)             | F.concat                 | src_*.sql:11-13 |
| split(s,delim)            | F.split (regex-escaped)  | src_*.sql:14 |
| element_at(arr,±n)        | F.element_at (1-based)   | src_*.sql:14; stg_mpd_player_id_map.sql:9 |
| replace(s,find,repl)      | F.replace (literal)      | stg_fg_proj_…_per_pa.sql:10 |
| split_part(s,sep,n)       | F.split_part             | app/app.py:876-877 |
| LIKE patterns             | Column.like              | stg_nfbc_sgp_inputs.sql:24-27 |
| current_timestamp         | F.current_timestamp      | src_*.sql:15 |
| nullif(x,y)               | F.nullif                 | stg_nfbc_sgp_factors.sql:14-17 |
| CASE WHEN chains          | operators.when_chain     | stg_proj_…_sgp_oc.sql:45-58 |
| CAST(x AS double/int)     | Column.cast              | stg_nfbc_ranked_standings.sql:12-28 |
| NULL AS col (typed)       | typed_null               | mart_…_50s.sql:29-47 |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# direct built-ins, re-exported for the explicit parity mapping
regexp_extract = F.regexp_extract
concat = F.concat
element_at = F.element_at  # 1-based, negative-from-end: same as Trino
current_timestamp = F.current_timestamp
nullif = F.nullif
split_part = F.split_part


def split(s: str | Column, delim: str) -> Column:
    """Trino ``split(s, delim)`` splits on a LITERAL delimiter;
    Spark's ``F.split`` takes a regex — escape it so ``split(x,'.')``
    or ``split(x,', ')`` behave identically to the reference."""
    import re

    c = F.col(s) if isinstance(s, str) else s
    return F.split(c, re.escape(delim))


def replace(s: str | Column, find: str, repl: str = "") -> Column:
    """Trino ``replace`` is literal (not regex) — Spark's
    ``F.replace`` matches; wrapped for the str-arg convenience."""
    c = F.col(s) if isinstance(s, str) else s
    return F.replace(c, F.lit(find), F.lit(repl))


def typed_null(dtype: str) -> Column:
    """``NULL AS col`` with an explicit type — the reference's
    union-schema padding (mart_…_50s.sql:29-47)."""
    return F.lit(None).cast(dtype)
