"""Parquet footer / row-group audit — the metadata-plane health check
a lakehouse runs before anything else: row-group sizing drives scan
parallelism and pruning (a 10M-row single-group file is a straggler
factory), and footer-only reads are how you audit a million files
without touching a data page.

The audit distributes pyarrow footer reads over the FILE LIST with
mapInPandas — per file cost is one footer fetch, so the job scales
with file count, not data volume. Verified in tests against DuckDB's
independent footer parser (parquet_file_metadata)."""

from __future__ import annotations

from dbt_lakehouse_aws_spark.localframe import local_frame
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_footer_audit(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per parquet file: rows, row groups, format version,
    average rows per group. Footer-only — no data pages touched."""
    import pandas as pd

    files = local_frame(spark, [(p,) for p in paths], "path string").repartition(
        max(1, min(len(paths), 64))
    )

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                out.append(
                    (
                        path,
                        md.num_rows,
                        md.num_row_groups,
                        # pyarrow reports '1.0'/'2.6'; the major digit
                        # is the thrift format_version
                        int(str(md.format_version).split(".")[0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["path", "n_rows", "n_row_groups", "format_version"]
            )

    return files.mapInPandas(
        read_footers,
        "path string, n_rows long, n_row_groups long, format_version long",
    ).select(
        "path",
        "n_rows",
        "n_row_groups",
        "format_version",
        F.expr("n_rows div n_row_groups").alias("avg_rows_per_group"),
    )
