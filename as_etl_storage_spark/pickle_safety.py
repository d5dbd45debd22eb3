"""Worker-process import safety for an in-place (not pip-installed) repo.

Any module-level function or class shipped into a Spark Python worker —
mapInPandas iterators, applyInPandasWithState state machines, pandas
UDAFs, Python DataSources — is cloudpickled BY REFERENCE: the worker
re-imports it. That works only when the worker's sys.path can see this
package, which holds when the driver launched from the repo root (workers
inherit the JVM's cwd in local mode) and silently breaks for any session
started elsewhere: the exact shape of an external harness importing
``__spark_entry__`` by path. Symptoms are opaque
PythonException/PYTHON_DATA_SOURCE_ERROR deep inside a query.

``ensure_worker_importable()`` registers every worker-touching module for
BY-VALUE cloudpickle serialization, making shipped functions
self-contained in the pickle stream — at unpickle time only stdlib,
pyspark, pyarrow, numpy and pandas are imported, all present in every
worker. Idempotent and cheap (a set insert per module); called from
queries/common.load_table so every contract query is covered under ANY
caller session, and callable directly by library users.
"""

from __future__ import annotations

_done = False


def ensure_worker_importable() -> None:
    global _done
    if _done:
        return
    from pyspark import cloudpickle

    import as_etl_storage_spark.functions as _functions
    import as_etl_storage_spark.functions.udafs as _udafs
    import as_etl_storage_spark.operators.dedup as _dedup
    import as_etl_storage_spark.operators.ml as _ml
    import as_etl_storage_spark.operators.multimodal as _multimodal
    import as_etl_storage_spark.operators.similarity as _similarity
    import as_etl_storage_spark.operators.text as _text
    import as_etl_storage_spark.plans.split as _split
    import as_etl_storage_spark.sources.pyds as _pyds
    import as_etl_storage_spark.streaming.micro_batch as _micro_batch
    import as_etl_storage_spark.streaming.stateful as _stateful

    for mod in (
        _functions,
        _udafs,
        _dedup,
        _ml,
        _multimodal,
        _similarity,
        _text,
        _split,
        _pyds,
        _micro_batch,
        _stateful,
    ):
        cloudpickle.register_pickle_by_value(mod)
    _done = True
