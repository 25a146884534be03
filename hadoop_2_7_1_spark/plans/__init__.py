"""Pipeline — JobControl analogue (SURVEY.md §2.10).

The reference's JobControl/ControlledJob (mapreduce/lib/jobcontrol/
JobControl.java:55) runs a DAG of jobs in dependency order, each job
materializing to files. On Spark, intra-query DAGs are lazy and need no
orchestration; Pipeline exists for the *inter-job* case — stages that must
materialize (checkpoint/write) before dependents start, e.g. Grep's two
chained jobs or dedup→similarity cascades.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    deps: list[str] = field(default_factory=list)
    materialize: bool = False  # cache+count before dependents run


class Pipeline:
    """Topologically-ordered execution of named stages.

    Each stage receives the dict of completed upstream results. Cycles are
    rejected; failures propagate with the stage name attached (the
    reference's ControlledJob FAILED/DEPENDENT_FAILED states collapse into
    exceptions here).
    """

    def __init__(self) -> None:
        self._stages: dict[str, Stage] = {}

    def add(
        self,
        name: str,
        fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame],
        deps: list[str] | None = None,
        materialize: bool = False,
    ) -> "Pipeline":
        if name in self._stages:
            raise ValueError(f"duplicate stage {name}")
        self._stages[name] = Stage(name, fn, deps or [], materialize)
        return self

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        order = self._topo_order()
        done: dict[str, DataFrame] = {}
        for name in order:
            st = self._stages[name]
            try:
                out = st.fn(spark, {d: done[d] for d in st.deps})
            except Exception as e:
                raise RuntimeError(f"stage {name!r} failed") from e
            if st.materialize and out is not None:
                out = out.cache()
                out.count()
            done[name] = out
        return done

    def _topo_order(self) -> list[str]:
        order: list[str] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(n: str) -> None:
            state = seen.get(n)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"cycle involving stage {n!r}")
            if n not in self._stages:
                raise ValueError(f"unknown dependency {n!r}")
            seen[n] = 0
            for d in self._stages[n].deps:
                visit(d)
            seen[n] = 1
            order.append(n)

        for n in self._stages:
            visit(n)
        return order
