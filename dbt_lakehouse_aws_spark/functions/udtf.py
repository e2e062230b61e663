"""Python UDTF escape hatch (Spark 4 user-defined table functions).

The reference exposes no runtime UDFs at all (SURVEY §2.10 — its
dbt macros are compile-time template expansions), so nothing here is
required for parity. This module exists because an engine needs a
sanctioned per-row → many-rows escape hatch for logic that is
genuinely imperative — iterative/greedy algorithms over a single
row's payload that neither SQL expressions nor ``explode`` can
state. Everything that CAN be array expressions should be (see
``standard_queries.chunk_documents`` — a codegen'd map-only chunker
— for the fast path this module deliberately is not).

Scale notes: a UDTF runs row-at-a-time in a Python worker (fork +
pickle per batch); its throughput ceiling is ~10-100× below
codegen'd expressions. Use it when per-row logic is irreducibly
imperative, keep the emitted row width small, and never put one
upstream of a shuffle it could have avoided.
"""

from __future__ import annotations

from collections import Counter

try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    HAS_UDTF = False

    def udtf(*a, **k):  # type: ignore[misc]
        def deco(cls):
            return cls

        return deco


@udtf(returnType="token string, cnt int, rank int")
class TopTokensUDTF:
    """Per-document top-k token counts with greedy first-seen
    tie-breaking — the tie rule ("earliest first occurrence wins")
    is positional/stateful, which is what makes this a fair UDTF
    citizen rather than an ``explode → groupBy → rank`` pipeline
    (a window rank cannot see first-occurrence order without
    carrying an extra posexplode column through the shuffle; here
    it is free)."""

    def eval(self, text: str, k: int):  # noqa: D102
        if not text:
            return
        toks = text.split(" ")
        counts = Counter(toks)
        first_seen = {}
        for i, t in enumerate(toks):
            first_seen.setdefault(t, i)
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], first_seen[kv[0]]))
        for rank, (tok, cnt) in enumerate(ordered[: int(k)], start=1):
            yield tok, cnt, rank


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL `LATERAL` use:

    ``SELECT d.doc_id, t.* FROM docs d,
      LATERAL top_tokens(d.text, 3) t``
    """
    if not HAS_UDTF:  # pragma: no cover
        raise RuntimeError("pyspark.sql.functions.udtf unavailable")
    spark.udtf.register("top_tokens", TopTokensUDTF)
