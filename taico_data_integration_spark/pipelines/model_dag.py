"""Model-DAG runner — the engine's dbt analog.

The reference's transformation layer is dbt models with ref()/source()
dependencies, run in groups with checks after each stage
(include/dbt/models/**, dags/retail.py:58-78). Here a model is a function
from named input DataFrames to one output DataFrame, declared with its
dependencies and an optional check suite; the runner topologically orders
models, executes each once, runs its checks (single-pass aggregates), and
optionally persists through the versioned TableStore.

Execution stays lazy where possible: a model's output DataFrame is handed
to downstream models directly (one Catalyst plan across models) unless the
model is marked `materialize=True` (staging-table semantics — also what you
want when several consumers would recompute an expensive subplan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter
from typing import Callable

from pyspark.sql import DataFrame

from ..checks.engine import Check, run_checks
from ..ops.formats import TableFormat


@dataclass
class Model:
    name: str
    fn: Callable[[dict[str, DataFrame]], DataFrame]
    deps: list[str] = field(default_factory=list)
    checks: list[Check] = field(default_factory=list)
    materialize: bool = False


class ModelDAG:
    def __init__(self, models: list[Model]):
        self.models = {m.name: m for m in models}
        if len(self.models) != len(models):
            raise ValueError("duplicate model names")

    def execution_order(self, sources: set[str]) -> list[str]:
        ts = TopologicalSorter()
        for m in self.models.values():
            unknown = [d for d in m.deps if d not in self.models and d not in sources]
            if unknown:
                raise ValueError(f"model {m.name}: unknown deps {unknown}")
            ts.add(m.name, *[d for d in m.deps if d in self.models])
        try:
            return [n for n in ts.static_order()]
        except CycleError as e:
            raise ValueError(f"model cycle: {e.args[1]}") from e

    def run(
        self,
        sources: dict[str, DataFrame],
        store: TableFormat | None = None,
        fail_fast: bool = True,
    ) -> dict:
        """Execute all models; returns {model: {'ok', 'checks'}} plus the
        final frames under '_frames'."""
        frames: dict[str, DataFrame] = dict(sources)
        results: dict[str, dict] = {}
        for name in self.execution_order(set(sources)):
            m = self.models[name]
            df = m.fn({d: frames[d] for d in m.deps})
            if m.materialize and store is not None:
                store.write(name, df)
                df = store.read(name)
            elif m.materialize:
                df = df.localCheckpoint()
            frames[name] = df
            check_results = run_checks(df, m.checks) if m.checks else []
            ok = all(c["ok"] for c in check_results)
            results[name] = {"ok": ok, "checks": check_results}
            if fail_fast and not ok:
                results["_frames"] = frames
                results["_failed"] = name
                return results
        results["_frames"] = frames
        return results
