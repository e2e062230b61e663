"""dbt_lakehouse_aws_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference lakehouse project
(``danolen/dbt-lakehouse-aws``, surveyed in /root/repo/SURVEY.md):

* schema-on-read CSV/TSV ingestion with path-derived partition
  metadata (reference ``models/source/*/_sources.yml``,
  ``src_*.sql:8-15``),
* latest-snapshot source semantics (``src_*.sql:17-21``),
* the full relational operator surface (SURVEY.md §2) expressed as
  idiomatic DataFrame/Spark-SQL plans that Catalyst can optimize,
* a model-DAG runner replacing dbt's ref()/source() topology,
* the SGP (Standings Gain Points) valuation pipeline,
* plus large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) designed
  for 100 TB / multi-executor scale.

Everything here is built on public Apache Spark APIs only.
"""

from dbt_lakehouse_aws_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
