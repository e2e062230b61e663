"""Round-6 staged queries run against their oracles every session —
the same count/schema-family/value-multiset compare as the driver
gate — so they arrive at registration pre-verified. Empty staging is
fine (round freshly opened); the parametrized tests simply collect
zero cases then."""

import duckdb
import pytest

from dbt_lakehouse_aws_spark.oracle import compare_frames
from dbt_lakehouse_aws_spark.sources.catalog import STAR_TABLES
from dbt_lakehouse_aws_spark import (staged_r10, staged_r11,
                                     staged_r12, staged_r13)

#: merged view over every staging file (r10…r13 — r8/r9 were
#: promoted into queries_r8.py / queries_r9.py at rounds 8/9);
#: duplicate names across files would silently shadow — asserted
#: disjoint below.
_FILES = (staged_r10, staged_r11, staged_r12, staged_r13)
STAGED_ORACLES = {k: v for m in _FILES for k, v in m.STAGED_ORACLES.items()}
STAGED_QUERIES = {k: v for m in _FILES for k, v in m.STAGED_QUERIES.items()}


def test_staging_files_are_disjoint():
    names = [n for m in _FILES for n in m.STAGED_QUERIES]
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"query staged in more than one file: {dupes}"

SF_DIR = "/root/testdata/sf0.001"


def test_every_staged_query_has_an_oracle():
    assert set(STAGED_ORACLES) == set(STAGED_QUERIES)


def test_staged_names_not_already_registered():
    from dbt_lakehouse_aws_spark import standard_queries as sq

    registered = {spec.name for spec in sq._REGISTRY}
    clash = registered & set(STAGED_QUERIES)
    assert not clash, f"staged names shadow registered queries: {clash}"


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_against_oracle(spark, name):
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    sdf = STAGED_QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    rel = con.sql(STAGED_ORACLES[name])
    problems = compare_frames(
        sdf.columns, srows, [c.lower() for c in rel.columns], rel.fetchall()
    )
    assert not problems, f"{name}: {problems}"
    assert srows  # a degenerate empty result would vacuously 'match'


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_plan_is_scalable(spark, name):
    """The registry-wide linter (test_plan_lint) only sees registered
    queries; staged ones must arrive at round-6 registration already
    plan-clean (no cartesian, no row UDFs, no single-partition
    funnels)."""
    from dbt_lakehouse_aws_spark.plans.lint import assert_scalable

    assert_scalable(STAGED_QUERIES[name](spark, SF_DIR))


def test_no_widened_numeric_staged_oracle_types():
    """Same class-killer as test_entry_contract's binder check, but
    over the STAGED oracles — a HUGEINT/DECIMAL result column must
    be caught while the query is still in staging, not by a red
    driver row after round-6 registration."""
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    bad = {}
    for name, sql in sorted(STAGED_ORACLES.items()):
        rel = con.sql(sql)
        widened = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
        ]
        if widened:
            bad[name] = widened
    assert not bad, f"staged oracles with widened columns: {bad}"
