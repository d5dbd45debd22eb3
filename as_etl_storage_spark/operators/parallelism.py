"""Adaptive input-parallelism guard for compute-heavy operators.

A parquet file is split into at most one task per row group, so a table
written as a single row group scans as ONE partition no matter how many
cores exist — and every expensive projection downstream (tokenization,
shingling, codec work) then runs serially until the first shuffle. At
real scale the problem disappears (a 100 TB table has thousands of row
groups/files and the scan parallelizes naturally), which is exactly why
the guard must be ADAPTIVE rather than an unconditional repartition: an
unconditional one would re-shuffle the full corpus for nothing on a
well-split table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constant_partition_key(col: Column) -> Column:
    """A window/exchange partition key that is 0 for EVERY row yet not
    foldable (``pmod(xxhash64(col), 1)``). Use it on windows whose input
    is already bounded (post-``limit`` top-k rows, per-bucket stats):
    a plain empty partition spec plans ``Exchange SinglePartition`` and
    logs WindowExec's "No Partition Defined" warning on every run, while
    a foldable ``lit(0)`` is optimized out back to the empty spec. With
    this key the plan shows an ordinary hash exchange and the warning
    stays reserved for windows that genuinely move a whole relation to
    one partition."""
    return F.pmod(F.xxhash64(col), F.lit(1))


import re

#: logical-plan nodes whose presence means the frame's parallelism is no
#: longer scan-bound (a shuffle/wide op upstream already spreads it) —
#: and, critically, whose presence makes the .rdd partition probe below
#: EXECUTE the upstream stages at plan-build time under AQE (a full
#: duplicated pass on an expensive lineage). Matched as capitalized node
#: tokens at word boundaries so column aliases don't false-positive; a
#: rare false hit only skips the repartition, never breaks correctness.
_WIDE_NODES = re.compile(
    r"\b(Join|Aggregate|Window|Sort|Repartition|RepartitionByExpression|"
    r"Deduplicate|Distinct|Intersect|Except|Generate)\b"
)


def spread_small_scan(
    df: DataFrame, min_parts: int | None = None, by: str | None = None
) -> DataFrame:
    """Round-robin-repartition ``df`` to ``min_parts`` (default: the
    session's defaultParallelism) ONLY when it is a narrow
    scan/projection whose partition count is below half that — i.e. only
    when the scan genuinely cannot feed the cores. No-op (and no added
    shuffle) whenever the source is already split or the lineage
    contains a wide operator, so at cluster scale this never fires; on
    single-row-group local fixtures it moves the small input once so the
    expensive per-row work downstream runs wide.

    The wide-operator gate matters beyond the shuffle-already-spreads
    argument: probing ``df.rdd`` on an AQE plan with exchanges EXECUTES
    the upstream stages during plan construction — a caller-supplied
    frame with a join/aggregate in its lineage would silently run twice.
    On a narrow scan the probe is free (no stages to materialize).

    Call it BEFORE the expensive projection: repartitioning after would
    ship the projected results, parallelizing nothing.

    ``by`` names a column to hash-partition on instead of round-robin.
    Use the key the downstream aggregation/join groups by (or a prefix
    of it): HashPartitioning(k) satisfies ClusteredDistribution(k, ...),
    so EnsureRequirements drops the aggregate's own exchange — the
    spread shuffle REPLACES a later, larger one (post-explode partial
    rows) rather than adding one (guide §2.4 "two operations keyed the
    same way share one exchange"). A keyed repartition also skips
    round-robin's local sort-before-repartition. Only pass a ``by`` key
    with far more distinct values than partitions (doc/record ids) —
    a low-cardinality key would recreate the skew this guard exists to
    avoid."""
    if _WIDE_NODES.search(df._jdf.queryExecution().optimizedPlan().toString()):
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target, F.col(by)) if by else df.repartition(target)
    return df
