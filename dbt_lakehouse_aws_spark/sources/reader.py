"""Source readers: schema-on-read CSV/TSV with path-derived metadata.

Reproduces the reference's source layer semantics (SURVEY.md §2.1
S1-S4; reference ``models/source/fangraphs/
src_fangraphs_projections_preseason_hitting.sql:7-16``):

* every raw column read as **string** (reference ``README.md:32-34``),
* ``year``/``month``/``day`` parsed from the Hive-style ingest path
  (``.../year=YYYY/month=M/day=D/file.csv``),
* ``_ptkey`` = ``concat(year, month, day)`` ingest ordering key,
* ``_filename`` = basename of the source file (load-bearing
  downstream: it carries projection-system / league identity),
* ``_loaddatetime`` = load audit timestamp.

Scale notes: ``F.col("_metadata.file_path")`` is evaluated at the
scan (per input split, no shuffle); the regexes are codegen'd JVM
expressions. On a 100 TB ingest directory the read parallelism comes
from file splits — nothing here adds a shuffle or a Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: metadata columns added by :func:`with_path_metadata`
PATH_META_COLS = ("year", "month", "day", "_ptkey", "_filename", "_loaddatetime")


def _file_path_col() -> Column:
    # `_metadata.file_path` is the modern (Spark >= 3.2) replacement for
    # input_file_name(): it's stable under joins and whole-stage codegen.
    return F.col("_metadata.file_path")


def with_path_metadata(df: DataFrame, *, path_col: Column | None = None) -> DataFrame:
    """Add the reference's ``$path``-derived columns to a raw scan.

    Mirrors reference ``src_*.sql:8-15`` exactly:
    ``regexp_extract("$path", 'year=(\\d{4})', 1) as year`` etc.,
    ``concat(year, month, day) as _ptkey``,
    ``element_at(split("$path", '/'), -1) as _filename``,
    ``current_timestamp as _loaddatetime``.
    """
    # `_metadata.file_path` is a URI: spaces etc. arrive percent-encoded,
    # but the reference's `$path` carries raw S3 keys and downstream
    # logic matches on literal filenames ('NFBC OC 2025 … .csv') — decode.
    raw = path_col if path_col is not None else _file_path_col()
    p = F.url_decode(raw)
    year = F.regexp_extract(p, r"year=(\d{4})", 1)
    month = F.regexp_extract(p, r"month=(\d{1,2})", 1)
    day = F.regexp_extract(p, r"day=(\d{1,2})", 1)
    return (
        df.withColumn("year", year)
        .withColumn("month", month)
        .withColumn("day", day)
        .withColumn("_ptkey", F.concat(year, month, day))
        .withColumn("_filename", F.element_at(F.split(p, "/"), -1))
        .withColumn("_loaddatetime", F.current_timestamp())
    )


def read_csv_source(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    header: bool = True,
    add_path_metadata: bool = True,
    recursive: bool = True,
) -> DataFrame:
    """Read a raw CSV/TSV ingest prefix, all columns as strings.

    ``inferSchema`` stays off on purpose: the reference types
    everything as varchar at the source layer and casts downstream
    (``README.md:34``). ``recursiveFileLookup`` lets one logical
    table span the ``year=/month=/day=`` tree while we still derive
    the partition values ourselves from the path (the reference's
    partitions are logical-by-path, not catalog-declared).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("inferSchema", "false")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.csv(path)
    # Select _metadata at scan time so it survives later transforms.
    df = df.select("*", "_metadata")
    if add_path_metadata:
        df = with_path_metadata(df)
    return df.drop("_metadata")


def read_csv_evolving(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    add_path_metadata: bool = True,
) -> DataFrame:
    """CSV ingest with **union-by-name schema drift** across partitions.

    The reference's ``dbt_utils.star()`` resolves the column set from
    the catalog at compile time (SURVEY §1.3), which silently absorbs
    a column added mid-year; a plain multi-file ``spark.read.csv``
    does NOT — with one inferred header, files whose headers differ
    are matched **positionally**, so ``year=2024/month=06`` adding a
    column in the middle shifts every later column's values into the
    wrong field. This reader defines the drift semantics explicitly:

    1. **Header discovery** — one distributed job reads the FIRST
       LINE of every file (open/readline/close per task: O(files)
       metadata-sized I/O, no full scan).
    2. **Group scan** — files are grouped by identical header; each
       group gets its own all-string scan with its own column set.
       The number of groups is the number of schema *versions*, not
       files — bounded and small.
    3. **Union by name** — groups combine with
       ``unionByName(allowMissingColumns=True)``: columns align by
       NAME, files predating a column carry typed NULLs, and the
       output column order is first-seen order across groups (the
       catalog-resolution order ``star()`` would produce).

    Path metadata (year/month/day/_ptkey/_filename) is derived per
    group scan, so latest-snapshot filters keep working unchanged.
    """
    import os

    # pathGlobFilter: one stray non-CSV in the tree (_SUCCESS, a
    # parquet part, .DS_Store) must be ignored, not header-grouped —
    # decoding its first "line" yields garbage or a UnicodeDecodeError
    paths_df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{csv,tsv}")
        .load(path)
        .select("path")
    )

    def first_lines(batches):
        from urllib.parse import unquote, urlparse

        import pandas as pd

        for pdf in batches:
            headers = []
            for p in pdf["path"]:
                # binaryFile reports URIs — percent-decode so paths
                # with spaces ('NFBC OC 2025 ... .csv') open correctly
                local = unquote(urlparse(p).path)
                with open(local, "rb") as fh:
                    headers.append(
                        fh.readline()
                        .decode("utf-8", errors="replace")
                        .rstrip("\r\n")
                    )
            yield pd.DataFrame({"path": pdf["path"], "header": headers})

    # binaryFile would read whole payloads if we took `content`; we only
    # take `path` (column pruning keeps it a listing) and read the first
    # line ourselves inside the executors.
    by_header: dict[str, list[str]] = {}
    for r in paths_df.mapInPandas(first_lines, "path string, header string").collect():
        by_header.setdefault(r["header"], []).append(r["path"])

    out: DataFrame | None = None
    data_cols: list[str] = []  # first-seen order across groups
    for header in sorted(by_header, key=lambda h: min(by_header[h])):
        # spark.read.csv accepts the URI form directly (it decodes
        # internally) — pass paths through untouched
        files = list(by_header[header])
        part = spark.read.option("header", "true").option("sep", sep).option(
            "inferSchema", "false"
        ).csv(files)
        data_cols += [c for c in part.columns if c not in data_cols]
        part = part.select("*", "_metadata")
        if add_path_metadata:
            part = with_path_metadata(part)
        part = part.drop("_metadata")
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    if out is None:
        raise FileNotFoundError(f"no CSV files under {os.fspath(path)}")
    meta = [c for c in PATH_META_COLS if c in out.columns]
    return out.select(*data_cols, *meta)


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's star-schema parquet tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_jsonl_source(
    spark: SparkSession,
    path: str,
    schema,
    *,
    corrupt_col: str = "_corrupt_record",
    add_path_metadata: bool = False,
    recursive: bool = True,
) -> DataFrame:
    """Read a JSON-Lines corpus (the LLM-training-data interchange
    format: one document object per line).

    Scale rules baked in:

    * **schema is required** — inference would scan the whole corpus
      a second time before the first real job; at 100 TB that is a
      full extra pass. Pass a ``StructType`` or DDL string.
    * **PERMISSIVE + quarantine column**: malformed lines land in
      ``corrupt_col`` instead of failing the job (one bad shard must
      not kill a corpus build). Filter ``col(corrupt_col).isNotNull()``
      into a quarantine sink, drop it from the clean path.
    * optional path metadata (same ``year=/month=/day=`` derivation
      as CSV ingest) so snapshot semantics work for JSONL drops too.
    """
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        schema = schema.add(T.StructField(corrupt_col, T.StringType()))
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("recursiveFileLookup", str(recursive).lower())
        .json(path)
    )
    if add_path_metadata:
        df = df.select("*", "_metadata")
        df = with_path_metadata(df).drop("_metadata")
    return df


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
    *,
    trim: bool = True,
) -> DataFrame:
    """Fixed-width text ingest — the mainframe/EDI landing format:
    each ``(name, start, width, dtype)`` spec (1-based start, DDL
    dtype) becomes a ``substring`` + optional ``trim`` + cast, all
    JVM-side expressions over ``spark.read.text`` — splittable line
    reader, whole-stage codegen parse, no Python.

    ANSI-safe: blank-padded empty fields become NULL via ``nullif``
    before the cast (a raw cast of '' throws under the driver's ANSI
    session). Numeric fields are right-aligned by convention; trim
    handles both alignments."""
    lines = spark.read.text(path)
    cols = []
    for name, start, width, dtype in colspecs:
        raw = F.substring(F.col("value"), start, width)
        if trim:
            raw = F.trim(raw)
        cols.append(F.nullif(raw, F.lit("")).cast(dtype).alias(name))
    return lines.select(*cols)
