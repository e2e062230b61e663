"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-corpus connector.

The reference's source plane is "external tables over raw files"
(SURVEY §2.1 S1); this module exercises the other half of a source
plane — a *programmatic* connector with real partition planning, the
API any bespoke feed (an internal service, a queue snapshot, a
benchmark generator) plugs in through. The concrete source here
generates the same word-corpus shape as the driver's `documents`
table, seeded and sliced per partition, so pipelines can dry-run
shuffle/skew behavior at arbitrary row counts with ZERO input I/O —
"what does my dedup plan do at 10^9 docs" without writing 10^9 docs.

Scale properties:

- `partitions()` returns row-range slices → Spark schedules one task
  per slice; parallelism is an option, not a file-layout accident.
- Each slice seeds its own RNG from (seed, start) — generation is
  deterministic AND independent per partition (no sequential scan of
  a shared stream), so a 1000-partition read produces identical data
  to a 10-partition read of the same range.
- The generator yields plain tuples; Spark batches them through
  Arrow. Nothing is materialized driver-side.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: the same small vocabulary shape the driver's documents table uses
_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window the a data column join small customer query big group stream "
    "filter vector order spark"
).split()


class _RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("partitions", "8"))
        self.seed = int(options.get("seed", "42"))
        self.min_words = int(options.get("min_words", "20"))
        self.max_words = int(options.get("max_words", "60"))
        # vocab=N > 0 swaps the 30-word corpus vocabulary for N
        # synthetic tokens w0..w{N-1} — realistic-vocabulary probes
        # (hash/LSH fan-out rates are vocabulary-sensitive; see
        # PERF.md's MinHash bug postmortem)
        self.vocab_size = int(options.get("vocab", "0"))

    def partitions(self):
        step = max(1, -(-self.rows // self.num_partitions))  # ceil div
        return [
            _RangeSlice(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition: _RangeSlice):
        if self.vocab_size > 0:
            vocab = [f"w{k}" for k in range(self.vocab_size)]
        else:
            vocab = _VOCAB
        for i in range(partition.start, partition.end):
            # per-ROW seeding keeps rows identical under any slicing
            rng = random.Random(self.seed * 1_000_003 + i)
            n = rng.randint(self.min_words, self.max_words)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            yield (i, text, f"src{i % 20}")


class SynthCorpusDataSource(DataSource):
    """Register then read:

    >>> spark.dataSource.register(SynthCorpusDataSource)
    >>> spark.read.format("synthcorpus").option("rows", 10_000).load()
    """

    @classmethod
    def name(cls) -> str:
        return "synthcorpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)
