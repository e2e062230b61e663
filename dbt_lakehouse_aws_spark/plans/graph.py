"""Model-DAG runner (SURVEY §3.1's dbt-equivalent, Spark-first).

The reference's transformation plane is a dbt project: 40 SQL models
linked by ``ref()`` into a DAG, each materialized as a table
(reference ``dbt_project.yml:38-51``). Here a model is a named
Python function ``(deps...) -> DataFrame`` whose parameter names ARE
its ``ref()`` declarations — the graph resolves them by name,
topo-sorts, and executes.

Materialization is pluggable per run:

* ``materialize=None`` (default) — models stay lazy DataFrames;
  Catalyst fuses the whole lineage into as few shuffles as the
  final action needs. This is usually the *fastest* plan: no forced
  parquet round-trips between layers.
* ``materialize="cache"`` — ``.persist()`` each multi-consumer node
  (fan_out > 1), the intra-job analogue of dbt's table-per-model.
  Downstream plans still carry the full textual lineage, so Catalyst
  re-optimizes a combinatorially growing tree on deep DAGs.
* ``materialize="checkpoint"`` — ``localCheckpoint(eager=False)``
  each multi-consumer node: like cache, but also TRUNCATES lineage,
  keeping downstream logical plans flat. Measured 2-3× faster
  end-to-end on the 20-model SGP DAG (planning-bound at small data).
  Caveat: localCheckpoint is not replayable after executor loss — on
  a long-lived cluster job prefer a reliable ``checkpoint()`` dir or
  ``materialize="table"``.
* ``materialize="table"`` — write each model to parquet under
  ``warehouse_dir`` and read it back: the reference's exact
  semantics (every model a table), useful when lineage re-use
  across *separate* jobs matters more than single-job latency.
* ``materialize="incremental"`` — the reference's stated roadmap
  item ("incremental materializations", reference README.md:44-48)
  on the ACID table layer (sources/acid.py): each model with a
  declared ``unique_key`` lands as a transactional ``MERGE INTO``
  against its existing table (copy-on-write on only the files that
  hold matched keys), models without one as an atomic overwrite.
  Re-running the DAG with a day's delta touches a sliver of each
  100 TB table instead of rewriting the world, and concurrent
  readers keep their snapshot.

Scale note: at 100 TB the lazy mode can recompute expensive shared
subtrees once per consumer; the runner counts consumers and caches
fan-out nodes under ``materialize="cache"`` — same decision dbt
makes statically, taken here from the declared graph.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame


class ModelGraph:
    """Named DataFrame-producing models with ``ref()``-style deps."""

    def __init__(self) -> None:
        self._models: dict[str, Callable[..., DataFrame]] = {}
        self._deps: dict[str, tuple[str, ...]] = {}

    def model(self, fn: Callable[..., DataFrame] | None = None, *, name: str | None = None):
        """Register a model; its parameter names are its dependencies."""

        def deco(f: Callable[..., DataFrame]):
            model_name = name or f.__name__
            params = tuple(inspect.signature(f).parameters)
            self._models[model_name] = f
            self._deps[model_name] = params
            return f

        return deco(fn) if fn is not None else deco

    def add_source(self, name: str, df: DataFrame) -> None:
        """Bind a raw input (a dbt ``source()``) as a zero-dep node."""
        self._models[name] = lambda _df=df: _df
        self._deps[name] = ()

    def topo_order(self) -> list[str]:
        ts = TopologicalSorter(
            {name: set(deps) for name, deps in self._deps.items()}
        )
        return list(ts.static_order())

    def fan_out(self) -> dict[str, int]:
        counts = {name: 0 for name in self._models}
        for deps in self._deps.values():
            for d in deps:
                counts[d] += 1
        return counts

    def run(
        self,
        *,
        materialize: str | None = None,
        warehouse_dir: str | None = None,
        only: set[str] | None = None,
        unique_keys: dict[str, list[str]] | None = None,
        checks: dict[str, dict] | None = None,
    ) -> dict[str, DataFrame]:
        """Execute the DAG; returns every model's DataFrame by name.

        ``checks`` maps model name → a dbt-style check spec
        (:func:`~dbt_lakehouse_aws_spark.plans.checks.run_checks`);
        each spec runs right after its model materializes, with every
        upstream model available as a relationships parent, and a
        failing check raises :class:`~dbt_lakehouse_aws_spark.plans.
        checks.CheckFailure` BEFORE any downstream model consumes the
        bad data — dbt-build semantics."""
        missing = {
            d for deps in self._deps.values() for d in deps if d not in self._models
        }
        if missing:
            raise KeyError(f"unresolved refs: {sorted(missing)}")
        needed: set[str] | None = None
        if only is not None:
            # transitive closure of dependencies: run exactly the
            # requested models and their ancestors (dbt --select
            # semantics), skipping every other subtree entirely
            needed = set()
            frontier = set(only)
            while frontier:
                node = frontier.pop()
                if node in needed:
                    continue
                needed.add(node)
                frontier.update(self._deps.get(node, ()))
        fan = self.fan_out()
        out: dict[str, DataFrame] = {}
        for name in self.topo_order():
            if needed is not None and name not in needed:
                continue
            df = self._models[name](*[out[d] for d in self._deps[name]])
            if materialize == "table" and warehouse_dir and self._deps[name]:
                path = f"{warehouse_dir}/{name}"
                df.write.mode("overwrite").parquet(path)
                df = df.sparkSession.read.parquet(path)
            elif materialize == "incremental" and warehouse_dir and self._deps[name]:
                from dbt_lakehouse_aws_spark.sources.acid import AcidTable

                table = AcidTable(df.sparkSession, f"{warehouse_dir}/{name}")
                keys = (unique_keys or {}).get(name)
                if table.exists() and keys:
                    table.merge(df, keys)
                else:
                    table.write(df, mode="overwrite")
                df = table.read()
            elif materialize == "cache" and fan[name] > 1:
                df = df.persist()
            elif materialize == "checkpoint" and fan[name] > 1 and self._deps[name]:
                df = df.localCheckpoint(eager=False)
            if checks and name in checks:
                from dbt_lakehouse_aws_spark.plans.checks import CheckFailure, run_checks

                report = run_checks(df, checks[name], model=name, parents=out).collect()
                bad = [r for r in report if not r["passed"]]
                if bad:
                    raise CheckFailure(
                        f"model {name!r} failed checks: "
                        + "; ".join(
                            f"{r['check']}({r['column']})={r['failed_rows']}" for r in bad
                        )
                    )
            out[name] = df
        return out


def manifest(
    graph: "ModelGraph",
    *,
    frames: dict[str, DataFrame] | None = None,
    checks: dict[str, dict] | None = None,
) -> dict:
    """dbt-docs-style manifest of a model graph (the documentation
    half of the reference's "Add tests and documentation" roadmap
    item, README.md:46): every node with its kind (source/model),
    dependencies, dependents, and — when ``frames`` from a
    :meth:`ModelGraph.run` are supplied — the resolved column schema,
    plus any declared check spec. Plain JSON-serializable dict:
    feed it to docs tooling, diff it in CI to catch accidental
    schema/dependency drift, or write it next to the warehouse.
    """
    fan = graph.fan_out()
    nodes = {}
    dependents: dict[str, list[str]] = {n: [] for n in graph._models}
    for name, deps in graph._deps.items():
        for d in deps:
            dependents[d].append(name)
    for name in graph.topo_order():
        node = {
            "kind": "source" if not graph._deps[name] else "model",
            "depends_on": sorted(graph._deps[name]),
            "dependents": sorted(dependents[name]),
            "fan_out": fan[name],
        }
        fn = graph._models[name]
        doc = inspect.getdoc(fn)
        if doc and node["kind"] == "model":
            node["description"] = doc.splitlines()[0]
        if frames and name in frames:
            node["columns"] = [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in frames[name].schema.fields
            ]
        if checks and name in checks:
            node["checks"] = checks[name]
        nodes[name] = node
    return {"nodes": nodes, "order": graph.topo_order()}


def write_manifest(path: str, graph: "ModelGraph", **kwargs) -> str:
    """Serialize :func:`manifest` as JSON; returns the path."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(manifest(graph, **kwargs), fh, indent=1, sort_keys=True)
    return path
