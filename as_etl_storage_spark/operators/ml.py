"""Iterative ML building block: deterministic Lloyd k-means over an
embedding column. The corpus never leaves the executors; the only driver
round-trip per iteration is the k x dim centroid table (a bounded value,
like split boundaries), which breaks the geometric lineage growth that a
fully-declarative loop would suffer.

The reference has no iterative/ML surface at all (SURVEY.md §2 — it is a
storage/transport layer); this is a north-star extension showing the Spark
pattern for iterative algorithms: a small state DataFrame (centroids) is
re-broadcast against the partitioned corpus each iteration, the corpus is
never shuffled, and all accumulations are decimal-exact so results are
identical under any partitioning.

Determinism contract:
  * seeding: centroids are the k smallest-id vectors (no RNG);
  * assignment ties break on smaller centroid id;
  * centroid updates are decimal-exact per-dimension sums (order-free)
    with one final double division;
  * empty clusters keep their previous centroid.

Scale notes: per iteration the corpus is scanned once and NEVER
shuffled. The vectorized impl's centroid update computes per-partition
k x dim partial sums via mapInPandas and combines them in-plan with a
groupBy(cid) whose exchange carries <= partitions x k partial rows —
no driver-proportional pull anywhere; the jvm impl shuffles only the
(cid, dim) partial aggregation — k*dim groups, i.e. tiny. Lineage
never grows: the vectorized assignment closes over the collected k-row
centroid table each round (so each iteration's plan is corpus-depth,
not iteration-depth), and the jvm path pins centroids as literals
every MATERIALIZE_EVERY iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from as_etl_storage_spark.functions import vec_dot as _dot

#: decimal type for exact centroid/objective accumulation
_DEC = "decimal(28,10)"


def _prepared(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )


def _literal_centroids(spark, rows) -> DataFrame:
    """The k x dim centroid rows as a PURE-JVM literal frame (explode of
    a literal struct array over range(1)). ``spark.createDataFrame``
    returns a Python-RDD-backed frame sliced across defaultParallelism
    partitions, so every consumer stage paid one Python-worker
    round-trip PER SLICE for k rows — 32 near-empty tasks per iteration
    (458 ms in the r18 trace), and coalescing them made ONE task pay all
    32 round-trips sequentially (6.3 s). Literal expressions run as
    codegen with no Python worker at all; float values ride exactly
    (F.lit on a Python float is the same IEEE double)."""
    if not rows:
        return spark.createDataFrame([], "cid long, cv array<double>")
    structs = [
        F.struct(
            F.lit(int(r["cid"])).cast("long").alias("cid"),
            F.array(
                *[F.lit(float(x)) for x in r["cv"]]
            ).alias("cv"),
        )
        for r in sorted(rows, key=lambda r: r["cid"])
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("c"))
        .select(F.col("c.cid").alias("cid"), F.col("c.cv").alias("cv"))
    )


def _assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per point: broadcast the k-row centroid table,
    squared-L2 argmin with cid tie-break. Adds a ``dist`` column.

    The argmin is min(struct(dist, cid, v)) under a hash aggregation —
    map-side partial aggregation collapses the k scored rows per point
    before any shuffle, where a row_number window would sort-shuffle all
    N*k rows. (dist, cid) is unique per group, so the array field never
    participates in the comparison.

    Squared norms are precomputed per point and per centroid before the
    k-way join: array folds are interpreted (no codegen for higher-order
    functions), so evaluating ||v||^2 and ||c||^2 inside the pair loop
    would triple the dominant per-pair cost. Same expression tree shape
    (n2v - 2*dot) + n2c, so distances are bit-identical."""
    corp = corpus.withColumn("n2v", _dot(F.col("v"), F.col("v")))
    cents = centroids.withColumn("n2c", _dot(F.col("cv"), F.col("cv")))
    d2 = F.col("n2v") - 2 * _dot(F.col("v"), F.col("cv")) + F.col("n2c")
    scored = corp.join(F.broadcast(cents)).select(
        "vid", F.struct(d2.alias("dist"), "cid", "v").alias("s")
    )
    return scored.groupBy("vid").agg(F.min("s").alias("s")).select(
        "vid", F.col("s.v").alias("v"), F.col("s.cid").alias("cid"),
        F.col("s.dist").alias("dist"),
    )


def _assign_np(corpus: DataFrame, cent_rows: list) -> DataFrame:
    """BLAS-vectorized nearest-centroid: the collected k x dim centroid
    matrix is closed over (bounded driver value, the same class as
    ``_materialize``), and each Arrow batch scores against ALL centroids
    with one matmul — the production path for wide embeddings, exactly the
    ``cosine_topk_vectorized`` pattern. The corpus is scanned once and
    never shuffled.

    Tie-break parity: centroids are sorted by cid and ``argmin`` takes the
    first minimum, so exact distance ties resolve to the smallest cid like
    the JVM ``min(struct(dist, cid))``. Distance values differ from the
    sequential JVM fold in the last ulp (SIMD pairwise summation), so
    near-tie assignments can flip — callers that need the hash-stable
    variant use ``impl='jvm'``; the validated-diagnostics contract
    (booleans) is invariant to either."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator as _It

    cids = np.array([r["cid"] for r in cent_rows], dtype="int64")
    order = np.argsort(cids, kind="stable")
    cids = cids[order]
    cmat = np.array([cent_rows[int(i)]["cv"] for i in order], dtype="float64")
    n2c = (cmat * cmat).sum(axis=1)

    schema = "vid long, v array<double>, cid long, dist double"

    def score(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            m = np.array(list(pdf["v"]), dtype="float64")
            d2 = (m * m).sum(axis=1, keepdims=True) - 2.0 * (m @ cmat.T) + n2c
            j = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"],
                    "v": pdf["v"],
                    "cid": cids[j],
                    "dist": d2[np.arange(len(j)), j],
                }
            )

    return corpus.mapInPandas(score, schema)


def _update(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """New centroid = decimal-exact per-dimension mean of assigned points;
    clusters that lost all points keep their previous centroid."""
    sums = (
        assigned.select("cid", F.posexplode("v").alias("d", "x"))
        .groupBy("cid", "d")
        .agg(
            F.sum(F.col("x").cast(_DEC)).alias("sx"),
            F.count("*").alias("n"),
        )
        .select(
            "cid", "d", (F.col("sx").cast("double") / F.col("n")).alias("m")
        )
    )
    new = sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
        ).alias("cv")
    )
    return (
        centroids.select("cid", F.col("cv").alias("old_cv"))
        .join(new, "cid", "left")
        .select("cid", F.coalesce("cv", "old_cv").alias("cv"))
    )


def _update_np(assigned: DataFrame, cent_rows: list) -> DataFrame:
    """Vectorized centroid update: per-partition k x dim partial sums via
    ``mapInPandas`` (the corpus itself is NEVER shuffled), combined
    IN-PLAN by a ``groupBy(cid)`` whose exchange carries at most
    partitions x k partial rows — never corpus bytes and, unlike the
    earlier driver combine of those same partials, never a
    driver-proportional pull (on a 100k-partition cluster with large
    k x dim that collect was a multi-GB driver transfer per iteration).
    The OLD centroids arrive as already-collected rows (``cent_rows``) —
    the SAME k-row collect the vectorized assignment closed over, done
    once per iteration by ``_step`` (collecting a DataFrame here too
    would re-execute the previous iteration's full corpus job a second
    time); they are re-created as literal rows for the empty-cluster
    fallback — bounded by k, independent of partition count, the same
    class as ``_materialize``.

    Determinism: per-cid partials are ``array_sort``-ed by partition id
    and left-folded with ``zip_with`` elementwise adds — the identical
    (cid, pid)-ordered sequence of double additions the driver loop
    performed, so centroids are bit-unchanged for a fixed partitioning;
    like the ``_assign_np`` distances they can differ from the
    decimal-exact ``_update`` in the last ulp — callers needing
    hash-stable centroids use ``impl='jvm'``. Empty clusters keep their
    previous centroid."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator as _It

    from pyspark import TaskContext

    spark = assigned.sparkSession
    # literal rows: the returned plan's fallback side never chains the
    # previous iteration's lineage (and _literal_centroids keeps the k
    # rows a zero-Python-worker LocalRelation-style subtree)
    old = _literal_centroids(spark, cent_rows)

    schema = "pid long, cid long, sx array<double>, n long"

    def partial(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        sums: dict = {}
        counts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf["v"]), dtype="float64")
            cids = pdf["cid"].to_numpy()
            for c in np.unique(cids):
                mask = cids == c
                block = m[mask].sum(axis=0)
                if c in sums:
                    sums[c] = sums[c] + block
                else:
                    sums[c] = block
                counts[c] = counts.get(c, 0) + int(mask.sum())
        if sums:
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "cid": list(sums),
                    "sx": [sums[c] for c in sums],
                    "n": [counts[c] for c in sums],
                }
            )

    partials = assigned.select("cid", "v").mapInPandas(partial, schema)
    # in-plan combine: pid-ordered left fold of the per-partition sums,
    # then one double division per dimension — the exact operation order
    # of the removed driver loop. The combine has AT MOST k groups, so
    # more than k reducers is pure scheduling waste (the session's 32
    # shuffle partitions ran 32 near-empty tasks per iteration); a keyed
    # repartition(k) satisfies the aggregate's clustering, so this stays
    # ONE exchange with k tasks — scale-independent (k is the group
    # count at any corpus size). Fold order is unchanged: the per-cid
    # pid-sort fixes the sequence regardless of partitioning.
    n_red = max(1, min(len(cent_rows),
                       spark.sparkContext.defaultParallelism))
    new = partials.repartition(n_red, "cid").groupBy("cid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pid", "sx"))),
            F.lit(None).cast("array<double>"),
            lambda acc, s: F.when(acc.isNull(), s["sx"]).otherwise(
                F.zip_with(acc, s["sx"], lambda a, b: a + b)
            ),
        ).alias("sx"),
        F.sum("n").alias("n"),
    )
    new = new.select(
        "cid", F.transform("sx", lambda x: x / F.col("n")).alias("cv")
    )
    # broadcast the <= k-row new side (stats are opaque behind
    # mapInPandas, so hint explicitly); left-outer keeps empty clusters
    return (
        old.select("cid", F.col("cv").alias("old_cv"))
        .join(F.broadcast(new), "cid", "left")
        .select("cid", F.coalesce("cv", "old_cv").alias("cv"))
    )


def _objective(assigned: DataFrame) -> DataFrame:
    """Total within-cluster squared distance, decimal-exact sum (order-free
    over per-row doubles that are themselves deterministic)."""
    return assigned.agg(
        F.sum(F.col("dist").cast(_DEC)).alias("obj"),
        F.count("*").alias("n_assigned"),
        F.countDistinct("cid").alias("n_clusters"),
    )


def _materialize(centroids: DataFrame) -> DataFrame:
    """Pin the k x dim centroid table as literal rows. Without this each
    Lloyd iteration's centroid plan embeds the whole previous iteration's
    lineage, so iteration i recomputes iterations 1..i-1 — plans (and
    runtimes) grow geometrically. k*dim doubles are a bounded driver
    value, the same class as split boundaries; the values re-broadcast
    are bit-identical, so results are unchanged."""
    spark = centroids.sparkSession
    rows = centroids.collect()
    return _literal_centroids(spark, rows)


#: pin centroids as literals every N iterations: short runs stay one fused
#: Catalyst job (no per-iteration job-launch overhead), long runs never
#: grow geometric lineage (iteration i otherwise recomputes 1..i-1)
MATERIALIZE_EVERY = 4


def _assign_impl(corpus: DataFrame, centroids: DataFrame, impl: str) -> DataFrame:
    """Dispatch one assignment pass. ``vectorized`` collects the bounded
    centroid table (k x dim) and scores via ``_assign_np``; ``jvm`` keeps
    the whole pass declarative (hash-stable distances)."""
    if impl == "vectorized":
        return _assign_np(corpus, centroids.collect())
    return _assign(corpus, centroids)


def _step(corpus: DataFrame, centroids: DataFrame, impl: str) -> DataFrame:
    """One Lloyd iteration (assign + update). In the vectorized impl the
    incoming centroids are collected EXACTLY once — the bounded k-row
    pull whose execution runs the previous iteration's corpus job — and
    the collected rows feed BOTH the assignment matmul and the update's
    empty-cluster fallback. Collecting per phase instead (as the
    pre-round-8 code did via separate assign/update dispatchers) executed
    that uncached corpus-lineage job twice per iteration, doubling the
    per-iteration scan cost the module docstring promises is single.
    ``jvm`` stays fully declarative (no collect; callers pin lineage via
    ``_materialize``)."""
    if impl == "vectorized":
        cent_rows = centroids.collect()
        return _update_np(_assign_np(corpus, cent_rows), cent_rows)
    return _update(_assign(corpus, centroids), centroids)


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    materialize_every: int = MATERIALIZE_EVERY,
    impl: str = "vectorized",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; return (vid, cid) assignments.

    ``impl='vectorized'`` (default) collects the k x dim centroids each
    iteration — which also pins lineage every round, subsuming
    ``materialize_every`` — and scores each Arrow batch with one matmul.
    ``impl='jvm'`` is the fully-declarative baseline with bit-stable
    sequential-fold distances."""
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    for i in range(iters):
        centroids = _step(corpus, centroids, impl)
        if impl != "vectorized" and (
            materialize_every and (i + 1) % materialize_every == 0
        ):
            centroids = _materialize(centroids)
    return _assign_impl(corpus, centroids, impl).select(
        "vid", F.col("cid").alias("cluster_id")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    impl: str = "jvm",
) -> DataFrame:
    """Trained centroid table (cid, cv) — the seed source for
    centroid-blocked semantic dedup (operators/dedup.semantic_dedup_pairs
    _seeded). ``impl='jvm'`` by default: sequential-fold distances are
    bit-stable, and with the decimal-exact updates the returned centroids
    are identical under any partitioning — so downstream blocking is
    hash-reproducible. Centroids are pinned as literal rows every round
    (bounded k x dim driver value), killing geometric lineage."""
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        centroids = _step(corpus, centroids, impl)
        if impl != "vectorized":
            centroids = _materialize(centroids)
    if impl == "vectorized":
        # the in-plan update returns a corpus-lineage frame; pin the
        # bounded k x dim result so downstream consumers (seeded dedup
        # blocking reuses the table repeatedly) don't re-scan the corpus
        # per use — the documented "literal rows" return contract
        centroids = _materialize(centroids)
    return centroids


def kmeans_validated(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    materialize_every: int = MATERIALIZE_EVERY,
    impl: str = "vectorized",
) -> DataFrame:
    """Diagnostics row with in-plan validation booleans (the approx-sketch
    testing pattern, see q_approx_bounds): Lloyd's objective is provably
    non-increasing, so ``obj_decreased`` must be TRUE; every point gets
    exactly one cluster, so ``all_assigned`` must be TRUE; the cluster
    count stays within [1, k]. The oracle pins all three — they hold under
    either assignment ``impl`` (the booleans are invariant to last-ulp
    distance differences; centroid updates stay decimal-exact)."""
    corpus = _prepared(df, id_col, vec_col)
    if impl == "vectorized":
        # the per-iteration centroid collect makes each round its own job,
        # so the corpus is scanned 2 + iters times; materialize the
        # prepared (vid, v) projection once. localCheckpoint rather than
        # persist: same MEMORY_AND_DISK block reuse across the iteration
        # jobs, but the blocks are ContextCleaner-freed when the result is
        # dropped instead of pinned in the CacheManager until an explicit
        # unpersist the lazy return value makes impossible. (On a real
        # cluster where executor loss must be survivable, swap for
        # persist + a caller-managed lifecycle or a reliable checkpoint.)
        # LAZY (eager=False): the very next action — the bounded seed
        # collect below — materializes the checkpoint blocks, so eager's
        # dedicated materialization job (plus its driver gap) was a pure
        # extra barrier (r18 trace)
        corpus = corpus.localCheckpoint(eager=False)
    centroids = corpus.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    if impl == "vectorized":
        # collect the seed centroids ONCE for both consumers (the obj0
        # assignment and iteration 1's step) — the naive form ran the
        # same bounded k-row collect as two separate Spark jobs
        c0_rows = centroids.collect()
        obj0_assign = _assign_np(corpus, c0_rows)
    else:
        obj0_assign = _assign(corpus, centroids)
    obj0 = _objective(obj0_assign).select(
        F.col("obj").alias("obj0"), F.col("n_assigned").alias("n0")
    )
    for i in range(iters):
        if impl == "vectorized" and i == 0:
            centroids = _update_np(_assign_np(corpus, c0_rows), c0_rows)
        else:
            centroids = _step(corpus, centroids, impl)
        if impl != "vectorized" and (
            materialize_every and (i + 1) % materialize_every == 0
        ):
            centroids = _materialize(centroids)
    objN = _objective(_assign_impl(corpus, centroids, impl))
    return objN.crossJoin(obj0).select(
        F.col("n_assigned").alias("n_points"),
        ((F.col("n_clusters") >= 1) & (F.col("n_clusters") <= k)).alias(
            "n_clusters_ok"
        ),
        (F.col("n_assigned") == F.col("n0")).alias("all_assigned"),
        (F.col("obj") <= F.col("obj0")).alias("obj_decreased"),
    )
