"""Shared Spark fixtures for the test suite.

One session per pytest run (module startup cost ~5 s); tests run on
``local[N]`` with the same scale-aware configs the engine ships
(AQE, Arrow, parquet pushdown — see dbt_lakehouse_aws_spark/session.py).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_lakehouse_aws_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    return get_spark("pytest")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF001
