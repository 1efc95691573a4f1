"""Minimal job-DAG runner mirroring the reference's Airflow task graphs
(dvf/explore/dag.py:94-131 fan-out/fan-in, dgv/metrics/dag.py short-circuit).

In production each job is one ``spark-submit`` wrapped in an Airflow
operator; this runner provides the same semantics (dependencies, skip
short-circuit, per-job retry) for local execution and tests without an
Airflow dependency. Results are passed by reference (the XCom equivalent),
not via files on disk.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Job:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    deps: list[str] = field(default_factory=list)
    retries: int = 0
    retry_delay_s: float = 0.0
    short_circuit: Callable[[dict[str, Any]], bool] | None = None


class JobDag:
    """Topologically-ordered job execution with short-circuit + retries."""

    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def add(self, job: Job) -> "JobDag":
        if job.name in self._jobs:
            raise ValueError(f"duplicate job {job.name}")
        self._jobs[job.name] = job
        return self

    def _topo_order(self) -> list[Job]:
        order: list[Job] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"dependency cycle through {name}")
            if name not in self._jobs:
                raise ValueError(f"unknown dependency {name}")
            seen[name] = 0
            for dep in self._jobs[name].deps:
                visit(dep)
            seen[name] = 1
            order.append(self._jobs[name])

        for name in self._jobs:
            visit(name)
        return order

    def run(self) -> dict[str, Any]:
        """Execute all jobs; returns {job: result}. A short-circuit that
        returns False skips the job AND its transitive dependents (the
        ShortCircuitOperator contract, dgv/metrics/task.py:59-72)."""
        results: dict[str, Any] = {}
        skipped: set[str] = set()
        for job in self._topo_order():
            if any(d in skipped for d in job.deps):
                skipped.add(job.name)
                continue
            if job.short_circuit is not None and not job.short_circuit(results):
                skipped.add(job.name)
                continue
            attempt = 0
            while True:
                try:
                    results[job.name] = job.fn(results)
                    break
                except Exception:
                    attempt += 1
                    if attempt > job.retries:
                        raise
                    time.sleep(job.retry_delay_s)
        results["__skipped__"] = sorted(skipped)
        return results
