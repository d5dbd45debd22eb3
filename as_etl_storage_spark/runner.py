"""Job runner: JSON spec -> read plan -> write — the reference's end-to-end
pipeline (SURVEY.md §3) as one lazy lineage.

Reference lifecycle parity:
  Job.Init (config parse + ping)            -> JobSpec.from_json + source.ping
  Job.Split (N task configs)                -> Catalyst file splits / range
                                               predicates (plans.planner)
  Task read loop (rows -> records -> chan)  -> DataFrame lineage (no
                                               materialization boundary)
  Writer accumulate/flush + retry           -> single distributed write;
                                               task retries are Spark's
  preSQL/postSQL                            -> spark.sql hooks around write
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # circular-free: maintenance imports spec, not runner
    from as_etl_storage_spark.writers.maintenance import MaintenanceResult
    from as_etl_storage_spark.writers.materialize import MaterializeResult

from dataclasses import dataclass

from as_etl_storage_spark.plans.planner import plan_read
from as_etl_storage_spark.spec import JobSpec
from as_etl_storage_spark.writers.writer import WriteResult


@dataclass(frozen=True)
class PipelineResult:
    """What a pipeline job did: one result per executed step, in
    EXECUTION order (ingest, then materialize in dependency order,
    then maintenance — see PipelineSpec). Each entry is the step's own
    result object (WriteResult / MaterializeResult /
    MaintenanceResult)."""

    steps: tuple


def run_job(
    spark: SparkSession, spec: JobSpec | dict[str, Any] | str
) -> (
    "WriteResult | DataFrame | MaintenanceResult | MaterializeResult"
    " | PipelineResult"
):
    """Execute a job spec. With a writer: run end-to-end, return WriteResult.
    Without: return the lazy DataFrame (ad-hoc/API path, SURVEY.md §3.3).
    A maintenance job (compact/checkpoint/vacuum on a versioned table)
    runs its declared steps and returns a MaintenanceResult. A
    materialize job refreshes an incremental materialized view and
    returns a MaterializeResult. A pipeline job runs its steps in the
    spec's resolved order and returns a PipelineResult; the first
    failing step aborts the rest (already-committed steps stay — each
    is itself atomic and idempotent to re-run)."""
    if not isinstance(spec, JobSpec):
        spec = JobSpec.from_json(spec)
    if spec.pipeline is not None:
        return PipelineResult(
            steps=tuple(
                run_job(spark, st) for st in spec.pipeline.steps
            )
        )
    if spec.materialize is not None:
        from as_etl_storage_spark.writers.materialize import run_materialize

        return run_materialize(spark, spec.materialize)
    if spec.maintenance is not None:
        from as_etl_storage_spark.writers.maintenance import run_maintenance

        return run_maintenance(spark, spec.maintenance)
    df = plan_read(spark, spec.reader)
    if spec.writer is None:
        return df
    from as_etl_storage_spark.writers.writer import make_writer

    return make_writer(spark, spec.writer).write(df)
