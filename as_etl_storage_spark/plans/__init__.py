from as_etl_storage_spark.plans.split import (
    BigIntConvertor,
    StringConvertor,
    TimeConvertor,
    SplitRangeResult,
    convertor_for,
    do_split,
    split_ranges,
    range_predicates,
)

__all__ = [
    "BigIntConvertor",
    "StringConvertor",
    "TimeConvertor",
    "SplitRangeResult",
    "convertor_for",
    "do_split",
    "split_ranges",
    "range_predicates",
]
