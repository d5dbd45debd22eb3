from as_etl_storage_spark.streaming.micro_batch import (
    MicroBatchWriter,
    file_stream,
    tumbling_counts,
    sliding_counts,
    session_windows,
    dedup_within_watermark,
)

__all__ = [
    "MicroBatchWriter",
    "file_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "dedup_within_watermark",
]
