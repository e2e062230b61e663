"""Small literal / driver-built DataFrames through the Arrow path.

``spark.createDataFrame(<python list>)`` parallelizes the rows into a
PYTHON-RDD-backed plan: every downstream action re-ships the pickled
rows through a Python worker (BatchEvalPython-style), so even a
1-row frame costs ~1-2 s per action on local[32], and a
``coalesce(1).write`` of one costs ~8 s (measured, round 9 — the
coalesced task chains every empty slice's Python eval into one task).
Routing the same rows through a ``pyarrow.Table`` instead yields a
JVM-side Arrow relation: the same actions cost ~0.05-0.25 s, and on
a real cluster the plan ships Arrow bytes instead of spinning Python
workers per task.

``local_frame`` is the drop-in replacement for every
``createDataFrame(rows, schema)`` call on driver-materialized rows
(tiny literal dimension tables, collected scalar grids, fixture
feeds). Values are converted by pyarrow against the EXACT Spark
schema (``to_arrow_schema``), so types — including timestamps,
dates, decimals, arrays, and NULLs — land exactly as the classic
path lands them; every converted query re-verifies against its
DuckDB oracle (round-9 gate).

Lives in a leaf module so query modules, operators, and sources can
all import it without cycles.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_frame(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: StructType | str,
) -> DataFrame:
    """Build a small DataFrame from driver-local ``rows`` (tuples /
    Rows, one per output row) with an EXPLICIT ``schema`` (DDL string
    or StructType), via pyarrow instead of a pickled-row RDD."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    arrow_schema = to_arrow_schema(st)
    data = [tuple(r) for r in rows]
    cols = list(zip(*data)) if data else [[] for _ in st.fields]
    arrays = [
        pa.array(list(c), type=f.type) for c, f in zip(cols, arrow_schema)
    ]
    return spark.createDataFrame(pa.Table.from_arrays(arrays, schema=arrow_schema))
