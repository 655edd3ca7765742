"""Batch orchestration contract (the reference's Airflow DAG — §3.3).

The reference schedules its notebook daily with 2 retries / 2-minute
delay via ``DatabricksSubmitRunOperator`` (0affc6b7559b_dag.py:18-41).
The engine needs no Airflow dependency for parity: this module mirrors
the DAG's contract (cadence, retries, catchup-off) as a plain-Python
runner any scheduler (cron, Airflow, Dagster) can call, keeping the
engine itself orchestrator-agnostic.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class JobSpec:
    """Mirror of the reference DAG's scheduling contract
    (0affc6b7559b_dag.py:23-33)."""

    name: str = "batch_data_processing"
    schedule: str = "@daily"
    retries: int = 2
    retry_delay_s: float = 120.0
    catchup: bool = False


def run_with_retries(
    job: Callable[[], object],
    spec: JobSpec = JobSpec(),
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Run ``job`` with the spec's retry policy; re-raises after the last
    attempt. ``sleep`` is injectable for tests."""
    last_error: Exception | None = None
    for attempt in range(spec.retries + 1):
        try:
            return job()
        except Exception as exc:  # noqa: BLE001 - retry any job failure
            last_error = exc
            if attempt < spec.retries:
                sleep(spec.retry_delay_s)
    assert last_error is not None
    raise last_error
