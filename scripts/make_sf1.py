"""Generate an sf1.0 dataset (10x sf0.1) for the order-of-magnitude
bench point (VERDICT r5 item 5). /root/testdata is read-only and the
driver ships no sf1.0, so this derives one from sf0.1 by 10-way
replication that PRESERVES the generator's scaling law (more users /
docs / vectors in the SAME 30-day window — measured: sf0.01→sf0.1
grows users 150→1500 with an identical ts range) while keeping
within-copy structure bit-identical:

* star keys shift per copy (offsets divisible by 8 so the synthetic
  p_partkey//8 part forest keeps its shape inside each copy);
* document tokens get a per-copy suffix for copies > 0 — within-copy
  shingle/Jaccard structure is EXACTLY sf0.1's (every token maps
  1:1), across copies the token sets are disjoint, so the dup rate
  per doc stays constant as the corpus grows (the generator's law);
* embeddings circular-shift their dimensions per copy — norms and
  within-copy cosines exact, cross-copy cosines decorrelate;
* events keep their timestamps (same window, 10x slot density —
  faithful to the generator; the co-activity graph genuinely
  densifies, which the sf1.0 PERF table flags as the expected
  super-linear family).

Usage: python scripts/make_sf1.py [out_dir=/tmp/sf1.0] [copies=10]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: per-copy key offsets — all divisible by 8 (part forest) and far
#: above every sf0.1 max key
OFF = {
    "custkey": 10_000_000,
    "orderkey": 100_000_000,
    "partkey": 10_000_000,
    "suppkey": 1_000_000,
    "event_id": 1_000_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count() or 8}")

    def gen(table: str, select_per_copy: str) -> None:
        parts = [
            f"SELECT {select_per_copy.format(c=c)} FROM '{SRC}/{table}.parquet'"
            for c in range(copies)
        ]
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    # dims: copied once (TPC-H scaling law — nation/region are fixed)
    for t in ("nation", "region"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied", flush=True)

    gen("customer",
        f"c_custkey + {{c}} * {OFF['custkey']} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    gen("orders",
        f"o_orderkey + {{c}} * {OFF['orderkey']} AS o_orderkey, "
        f"o_custkey + {{c}} * {OFF['custkey']} AS o_custkey, "
        f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem",
        f"l_orderkey + {{c}} * {OFF['orderkey']} AS l_orderkey, "
        f"l_partkey + {{c}} * {OFF['partkey']} AS l_partkey, "
        f"l_suppkey + {{c}} * {OFF['suppkey']} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate")
    # brand/type get a copy tag so blocked joins (record linkage) see
    # 10x the blocks, not 10x-deep blocks — the generator's law (more
    # distinct values, same per-value density)
    gen("part",
        f"p_partkey + {{c}} * {OFF['partkey']} AS p_partkey, "
        f"CASE WHEN {{c}} = 0 THEN p_name ELSE p_name || ' c{{c}}' END AS p_name, "
        f"CASE WHEN {{c}} = 0 THEN p_brand ELSE p_brand || 'c{{c}}' END AS p_brand, "
        f"CASE WHEN {{c}} = 0 THEN p_type ELSE p_type || ' c{{c}}' END AS p_type, "
        f"p_size, p_retailprice")
    gen("supplier",
        f"s_suppkey + {{c}} * {OFF['suppkey']} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    gen("events",
        f"event_id + {{c}} * CAST({OFF['event_id']} AS BIGINT) AS event_id, ts, "
        f"user_id + {{c}} * {OFF['user_id']} AS user_id, event_type, value, props")
    gen("documents",
        f"doc_id + {{c}} * {OFF['doc_id']} AS doc_id, "
        f"CASE WHEN {{c}} = 0 THEN text ELSE array_to_string("
        f"list_transform(string_split(text, ' '), t -> t || 'q{{c}}'), ' ') END AS text, "
        f"lang, source, "
        f"CASE WHEN {{c}} = 0 THEN n_chars ELSE CAST(length(array_to_string("
        f"list_transform(string_split(text, ' '), t -> t || 'q{{c}}'), ' ')) AS BIGINT) END AS n_chars")
    gen("embeddings",
        f"vec_id + {{c}} * {OFF['vec_id']} AS vec_id, "
        f"CASE WHEN {{c}} = 0 THEN embedding ELSE "
        f"list_slice(embedding, {{c}} + 1, len(embedding)) || list_slice(embedding, 1, {{c}}) "
        f"END AS embedding, label")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
