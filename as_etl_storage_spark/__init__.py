"""as_etl_storage_spark — a PySpark-native rebuild of the capability surface
of as-tool/as-etl-storage (a DataX-style ETL storage/connector layer), plus
the large-scale training-data pipeline operators a 100 TB deployment needs.

Reference semantics are documented in SURVEY.md; citations in docstrings are
``path:line`` into /root/reference (read-only). This is a Spark-first design:
the reference's JSON job spec compiles to DataFrame lineage and Catalyst owns
execution — no hand-built row pipeline.
"""

from as_etl_storage_spark.session import get_spark
from as_etl_storage_spark.spec import JobSpec, ReaderSpec, WriterSpec
from as_etl_storage_spark.runner import run_job
from as_etl_storage_spark.engine import Engine

__all__ = ["Engine", "get_spark", "JobSpec", "ReaderSpec", "WriterSpec", "run_job"]
__version__ = "0.1.0"
