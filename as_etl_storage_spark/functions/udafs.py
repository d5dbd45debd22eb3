"""Grouped-aggregate pandas UDFs (Arrow-batched UDAF surface).

NOTE: no ``from __future__ import annotations`` here — Spark infers the
GROUPED_AGG eval type from the *resolved* type hints (pd.Series -> float),
and postponed annotations turn them into unresolvable strings.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact per-group median. Selection, not accumulation: the result is
    one value (or a single midpoint average) from the sorted group, so it
    is order-independent and hash-stable — unlike float sums, which would
    vary with partitioning. Each group must fit in one Arrow batch
    (GROUPED_AGG contract); at 100 TB keep grouped-agg UDAFs for
    bounded-cardinality groups and use decimal-sum SQL for the rest."""
    return float(v.median())
