"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
  * cosine_topk       — brute-force exact top-k: the correctness baseline.
                        Cost O(|queries| x |corpus|); distributed as a
                        broadcast of the (small) query set against the
                        partitioned corpus, so no shuffle of the corpus.
  * lsh_bucket_topk   — the scale path: sign-bit LSH (axis-aligned
                        hyperplanes through dims 0..n_bits-1) buckets the
                        corpus; search only within the query's bucket.
                        Deterministic (no random projections) so results are
                        reproducible and SQL-expressible for the oracle. At
                        100 TB swap the axis-aligned planes for learned IVF
                        centroids; the plumbing (bucket column, bucketed
                        join, within-bucket rank) is identical.

Output contains id pairs + integer rank only — float scores stay internal
(comparison robustness; see queries/__init__ determinism policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from as_etl_storage_spark.functions import vec_dot as _dot, vec_norm as _norm

#: hard cap on the query side of brute-force/rescored ANN. The query set
#: is collected (vectorized path) or built into a driver-side broadcast
#: relation (JVM paths); both are safe only while it stays query-sized. A
#: user predicate that matches 1% of a 100 TB corpus would otherwise OOM
#: the driver — fail fast with an actionable error instead. Callers with
#: genuinely larger query sets raise ``max_queries`` explicitly (driver
#: memory permitting) or switch to the bucketed strategies
#: (lsh_bucket_topk / ivf_topk), whose query side is never collected.
MAX_QUERY_ROWS = 100_000


def _check_query_cap(
    queries: DataFrame,
    query_pred: str,
    cap: int,
    df: DataFrame | None = None,
    id_col: str | None = None,
) -> None:
    """One cheap guard job: LIMIT cap+1 over the filtered scan, raising
    before any collect/broadcast is attempted. Runs on the JVM broadcast
    paths, where the relation build — not a visible ``.collect()`` — is
    the driver-memory hazard.

    The count prefers an id-only projection of the RAW frame (predicates
    almost always reference just ``vid``): the prepared/quantized frames
    filter on per-row array folds (norm > 0, amax > 0), so counting THEM
    would evaluate vector math across the whole corpus — a second heavy
    pass at 100 TB, where the pruned id scan is near-metadata. The cheap
    count can only over-count (it skips the zero-norm drop), so the
    guard errs toward raising — the safe direction. Predicates that
    reference prepared columns fall back to the prepared frame."""
    guarded = queries
    if df is not None and id_col is not None:
        try:
            cheap = df.select(F.col(id_col).alias("vid")).where(query_pred)
            cheap.schema  # force analysis: does the pred resolve on id alone?
            guarded = cheap
        except Exception:
            pass
    if guarded.limit(cap + 1).count() > cap:
        raise ValueError(
            f"query_pred {query_pred!r} matches more than {cap} rows; "
            f"brute-force ANN collects/broadcasts the query side — pass "
            f"max_queries to raise the cap, or use a bucketed strategy "
            f"(lsh_bucket_topk / ivf_topk) for corpus-sized query sets"
        )


def _collect_query_rows(queries: DataFrame, query_pred: str, cap: int) -> list:
    """Bounded collect for the vectorized path: the LIMIT bounds the pull
    itself, so an oversized predicate raises after at most cap+1 rows
    reach the driver — no separate guard job."""
    rows = queries.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query_pred {query_pred!r} matches more than {cap} rows; "
            f"vectorized ANN collects the query side — pass max_queries "
            f"to raise the cap, or use a bucketed strategy "
            f"(lsh_bucket_topk / ivf_topk) for corpus-sized query sets"
        )
    return rows


def _prepared(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project (vid, v, norm), dropping null and zero-norm vectors: a zero
    vector has no direction, so cosine against it is undefined — under
    ANSI SQL the division errors out and kills the job on the one corrupt
    row a real corpus always contains. Excluding it matches the effective
    oracle behavior (NaN fails every similarity threshold)."""
    return (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("norm", _norm(F.col("v")))
        .where(F.col("norm") > 0)
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_pred: str,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row (rows satisfying
    query_pred) against the whole corpus. The query side is broadcast —
    the corpus is scanned once, never shuffled. ``max_queries`` caps the
    query side (see MAX_QUERY_ROWS); oversized predicates raise."""
    corpus = _prepared(df, id_col, vec_col)
    queries = corpus.where(query_pred).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    _check_query_cap(queries, query_pred, max_queries, df, id_col)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("qid") != F.col("vid"))
        .select("qid", "vid", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def knn_label_vote(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    query_pred: str,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """kNN classification eval: predict each query vector's label by
    majority vote over its k exact cosine neighbors (tie-break: smaller
    label wins). Returns (query_id, true_label, pred_label) — join-ready
    for a confusion matrix / accuracy aggregate.

    Plan shape matches cosine_topk: the query set broadcasts, the corpus is
    scanned once with no shuffle; the vote is a tiny per-query aggregate."""
    corpus = (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.col(label_col).alias("nlabel"),
        )
        .withColumn("norm", _norm(F.col("v")))
        .where(F.col("norm") > 0)  # see _prepared
    )
    queries = corpus.where(query_pred).select(
        F.col("vid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("nlabel").alias("true_label"),
    )
    _check_query_cap(queries, query_pred, max_queries, df, id_col)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("qid") != F.col("vid"))
        .select("qid", "true_label", "nlabel", cos.alias("cos"), "vid")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    top = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    votes = top.groupBy("qid", "true_label", "nlabel").agg(
        F.count("*").alias("c")
    )
    vw = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("nlabel"))
    return (
        votes.withColumn("r", F.row_number().over(vw))
        .where(F.col("r") == 1)
        .select(
            F.col("qid").alias("query_id"),
            "true_label",
            F.col("nlabel").alias("pred_label"),
        )
    )


def sign_bucket(v: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dimensions
    (axis-aligned hyperplanes). 2^n_bits buckets."""
    bucket = F.lit(0)
    for d in range(n_bits):
        bucket = bucket + F.when(v.getItem(d) >= 0, F.lit(1 << d)).otherwise(0)
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_bits: int = 8,
) -> DataFrame:
    """Bucketed ANN: rank neighbors within each vector's sign-bit bucket.
    The self-join key is the bucket id — candidate set shrinks ~2^n_bits x.
    Recall depends on bucket granularity (IVF-style tradeoff)."""
    e = _prepared(df, id_col, vec_col).withColumn(
        "bucket", sign_bucket(F.col("v"), n_bits)
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("qid"),
            F.col("a.bucket").alias("bucket"),
            F.col("b.vid").alias("vid"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "bucket",
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are the vectors with the ``n_centroids`` smallest ids —
    deterministic seeding (k-means++ init and Lloyd iterations would make
    centroids float-accumulation order-dependent; for a reproducible,
    oracle-checkable building block the seeded assignment IS the quantizer;
    production swaps in trained centroids, the plan is identical).

    Plan: broadcast the tiny centroid set against the corpus (no corpus
    shuffle), rank by cosine with unique tie-break."""
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    scored = corpus.join(F.broadcast(centroids)).select(
        "vid", "cid", cos.alias("cos")
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("centroid_id"))
    )


def ivf_probe_assign_seeded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    nprobe: int = 1,
) -> DataFrame:
    """``ivf_probe_assign`` with TRAINED centroids — the production IVF
    quantizer the smallest-id variants stand in for: pass
    ``operators/ml.kmeans_centroids`` output (cid, cv) and the cells align
    with the corpus's density modes. Plan identical: the bounded centroid
    table broadcasts, the corpus is scanned once, never shuffled.
    Zero-norm centroids are dropped (no direction under cosine)."""
    corpus = _prepared(df, id_col, vec_col)
    cents = (
        centroids.select(
            F.col("cid"), F.col("cv").cast("array<double>").alias("cv")
        )
        .withColumn("cn", _norm(F.col("cv")))
        .where(F.col("cn") > 0)
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    scored = corpus.join(F.broadcast(cents)).select(
        "vid", "cid", cos.alias("cos")
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= nprobe)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("centroid_id"))
    )


def ivf_probe_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    nprobe: int = 1,
) -> DataFrame:
    """Top-``nprobe`` centroid assignments per vector (cosine rank with
    cid tie-break): probe lists for the query side of IVF search. With
    nprobe=1 this is exactly ``ivf_assign``."""
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    scored = corpus.join(F.broadcast(centroids)).select(
        "vid", "cid", cos.alias("cos")
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= nprobe)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("centroid_id"))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: every corpus vector lives in exactly ONE inverted list
    (its nearest centroid); each query probes its ``nprobe`` nearest lists
    and ranks only those candidates. Candidate set shrinks
    ~n_centroids/nprobe times vs brute force; the join key is the centroid
    id (equi-join, AQE handles list-size skew). Raising nprobe is the
    standard recall lever — the plan shape does not change, only the probe
    fan-out.

    One quantizer pass, one index build: the member assignment
    (rnk == 1) and the probe assignment (rnk <= nprobe) come from the
    SAME ranked corpus-x-centroid scan, checkpointed once, and the
    inverted index ``e`` — consumed by both sides of the candidate join
    — is materialized once too. The naive composition (ivf_assign +
    ivf_probe_assign + ``e`` re-planned per join side) ran the corpus
    scan and the quantizer window up to four times per query; production
    IVF *stores* the index, so materializing it is the algorithm's own
    shape, not a cache trick. Values are identical (same windows, same
    tie-breaks). The eager pins trade cluster-mode executor-loss
    recovery for the saved passes (unreplicated blocks — see the
    operators/dedup module note)."""
    if nprobe < 1:
        # the pre-r17 composition returned an empty frame for nprobe=0 —
        # silently probing 1 list instead would change semantics; a probe
        # count below 1 is a caller bug, fail it by name
        raise ValueError(f"ivf_topk requires nprobe >= 1, got {nprobe}")
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
    )
    qcos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    wq = Window.partitionBy("vid").orderBy(
        F.col("qcos").desc(), F.col("cid")
    )
    ranked = (
        corpus.join(F.broadcast(centroids))
        .select("vid", "cid", qcos.alias("qcos"))
        .withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= nprobe)
        .select("vid", "cid", "rnk")
        .localCheckpoint(eager=True)
    )
    e = corpus.join(
        ranked.where(F.col("rnk") == 1).select(
            "vid", F.col("cid").alias("centroid_id")
        ),
        "vid",
    ).localCheckpoint(eager=True)
    if nprobe <= 1:
        # a query's one probe list IS its own list — no probes join
        a = e.withColumn("probe_cid", F.col("centroid_id")).alias("a")
    else:
        probes = ranked.where(F.col("rnk") <= nprobe).select(
            "vid", F.col("cid").alias("probe_cid")
        )
        a = e.join(probes, "vid").alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = a.join(
        b,
        (F.col("a.probe_cid") == F.col("b.centroid_id"))
        & (F.col("a.vid") != F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("qid"),
        F.col("a.centroid_id").alias("centroid_id"),
        F.col("b.vid").alias("vid"),
        cos.alias("cos"),
    )
    # a query probing several lists can meet the same neighbor only once
    # (each corpus vector is in one list), so no dedup is needed pre-rank
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "centroid_id",
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def cosine_topk_vectorized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_pred: str,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Numpy-vectorized variant of cosine_topk: the (small) query set is
    collected into one normalized matrix Q and closed over; each corpus
    Arrow batch scores against ALL queries with a single BLAS matmul
    (batch x dim) @ (dim x |Q|), keeping per-query local top-k before the
    final global WindowGroupLimit rank.

    Same plan skeleton as cosine_topk (corpus scanned once, never
    shuffled; shuffle volume ~ |Q| x k x partitions). For wide vectors the
    matmul beats the per-row JVM fold by an order of magnitude — this is
    the production path for 768-d embeddings; the JVM form stays as the
    pure-SQL baseline. Float summation order differs from the sequential
    fold (SIMD pairwise), so near-tie ranks can flip in the last ulp —
    equality with the JVM variant is asserted on the fixture in tests, but
    this variant is deliberately NOT oracle-hash-gated."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator as _It

    corpus = _prepared(df, id_col, vec_col)
    qrows = _collect_query_rows(
        corpus.where(query_pred), query_pred, max_queries
    )
    qids = np.array([r["vid"] for r in qrows], dtype="int64")
    qm = np.array([r["v"] for r in qrows], dtype="float64")
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    out_schema = "qid long, vid long, cos double"

    def score(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            m = np.array(list(pdf["v"]), dtype="float64")
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qm.T  # (batch, |Q|)
            vids = pdf["vid"].to_numpy()
            take = min(k + 1, len(vids))
            # per-batch local top-(k+1) per query (self may rank)
            idx = np.argpartition(-sims, take - 1, axis=0)[:take]
            rows = {"qid": [], "vid": [], "cos": []}
            for j in range(sims.shape[1]):
                for i in idx[:, j]:
                    if vids[i] != qids[j]:
                        rows["qid"].append(qids[j])
                        rows["vid"].append(int(vids[i]))
                        rows["cos"].append(float(sims[i, j]))
            yield pd.DataFrame(rows)

    local = corpus.select("vid", "v").mapInPandas(score, out_schema)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


# ---------------------------------------------------------------- PQ ------
def _block_sqdist(a: str, b: str, lo: int, width: int) -> str:
    """SQL for squared L2 between slices [lo, lo+width) of two arrays,
    written in dot-product form (dot(a,a) - 2dot(a,b) + dot(b,b)) with
    sequential folds — the exact expression DuckDB's list_dot_product
    evaluates, so distances are bit-identical across engines."""
    def dot(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with(slice({x},{lo},{width}), "
            f"slice({y},{lo},{width}), (x, y) -> x * y), 0D, "
            f"(acc, z) -> acc + z)"
        )

    return f"({dot(a, a)} - 2 * {dot(a, b)} + {dot(b, b)})"


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    n_codes: int = 16,
) -> DataFrame:
    """Product-quantization encoder: each vector splits into ``m``
    sub-blocks; per block the code is the nearest (squared-L2) of
    ``n_codes`` codebook entries. Codebooks are the sub-blocks of the
    ``n_codes`` smallest-id vectors — deterministic seeding, same stance
    as ivf_assign (production swaps in trained codebooks; the plan is
    identical). Output: (vid, code0..code{m-1}) — m uint8-range ints
    replace dim doubles, a 64x compression at dim=64/m=4.

    Plan: ONE broadcast join corpus x codebook, all m block distances in
    one projection, all m argmins in one hash aggregation (min over
    (dist, cid) structs — map-side combine, no sort)."""
    width = dim // m
    corpus = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cb = corpus.where(F.col("vid") < n_codes).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    block_exprs = [
        f"{_block_sqdist('v', 'cv', j * width + 1, width)} AS d{j}"
        for j in range(m)
    ]
    scored = corpus.join(F.broadcast(cb)).selectExpr("vid", "cid", *block_exprs)
    aggs = [
        F.min(
            F.struct(F.col(f"d{j}").alias("d"), F.col("cid").alias("cid"))
        ).alias(f"s{j}")
        for j in range(m)
    ]
    enc = scored.groupBy("vid").agg(*aggs)
    return enc.select(
        "vid", *[F.col(f"s{j}.cid").alias(f"code{j}") for j in range(m)]
    )


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    n_queries: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: queries keep exact vectors,
    the corpus is its PQ codes; approx distance = sum over blocks of the
    query-to-codebook lookup-table entry for the block's code. The m
    lookup joins are broadcasts of a (queries x codes x blocks) table —
    the corpus is scanned once as codes, never as vectors. The final sum
    adds the m doubles in a FIXED left-to-right order (no float
    aggregation), so ranking is deterministic cross-engine.

    At 100 TB this is the memory story for ANN: the scan side holds
    m bytes per vector instead of 8*dim, and the exact-vector re-rank of
    the top candidates (not shown) touches only k*|queries| rows."""
    width = dim // m
    corpus = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cb = corpus.where(F.col("vid") < n_codes).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    queries = corpus.where(F.col("vid") < n_queries).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv")
    )
    lut_exprs = [
        f"{_block_sqdist('qv', 'cv', j * width + 1, width)} AS ld{j}"
        for j in range(m)
    ]
    lut = queries.join(F.broadcast(cb)).selectExpr("qid", "cid", *lut_exprs)
    codes = pq_encode(df, id_col, vec_col, dim, m, n_codes)
    scored = codes.crossJoin(F.broadcast(queries.select("qid")))
    for j in range(m):
        lj = lut.select(
            "qid", F.col("cid").alias(f"code{j}"), F.col(f"ld{j}")
        )
        scored = scored.join(F.broadcast(lj), ["qid", f"code{j}"])
    adist = F.expr(" + ".join(f"ld{j}" for j in range(m)))
    ranked = scored.where(F.col("vid") != F.col("qid")).select(
        "qid", "vid", adist.alias("ad")
    )
    w = Window.partitionBy("qid").orderBy(F.col("ad").asc(), F.col("vid"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def int8_topk_rescore(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_pred: str,
    mult: int = 4,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Scalar-quantized ANN with exact rescoring — the memory/IO lever for
    100 TB embedding stores: per-vector symmetric int8 quantization
    (scale = max|x|/127) shrinks the scanned corpus 4x (8x vs float64);
    the integer dot product ranks candidates, then only the top
    ``mult*k`` per query are re-scored with exact float cosine. The
    standard two-stage retrieve-then-rerank shape (FAISS SQ8, ScaNN).

    Cross-engine determinism end to end: quantized codes are integers
    (floor(x*127/amax + 0.5), exact in both engines), the candidate score
    is an integer dot (<= 127*127*dim, exactly representable) times two
    exactly-rounded double scale factors, and ties break on vid — so the
    candidate cut, unlike float-sum scores, cannot flip between engines.
    The final rank comes from the exact-cosine rerank of that fixed set.

    Scale: queries (quantized + float) broadcast; the corpus is scanned
    once — at scale the int8 codes + scale column are the STORED table
    (written once at ingest), and the float vectors live in a separate
    table joined only for the mult*k survivors, so the hot scan reads
    1/4 the bytes. Shuffle carries only candidate rows (|Q| x mult*k)."""
    base = (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("amax", F.array_max(F.transform(F.col("v"), F.abs)))
        .where(F.col("amax") > 0)
        .withColumn(
            "qv",
            F.expr("transform(v, x -> CAST(floor(x * 127.0D / amax + 0.5D) AS INT))"),
        )
        .withColumn("scale", F.col("amax") / F.lit(127.0))
    )
    queries = base.where(query_pred).select(
        F.col("vid").alias("qid"),
        F.col("qv").alias("qqv"),
        F.col("scale").alias("qscale"),
        F.col("v").alias("qval"),
    )
    _check_query_cap(queries, query_pred, max_queries, df, id_col)
    idot = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    approx = idot.cast("double") * F.col("qscale") * F.col("scale")
    scored = (
        F.broadcast(queries)
        .join(base, F.col("qid") != F.col("vid"))
        .select("qid", "vid", "v", "qval", approx.alias("approx"))
    )
    wc = Window.partitionBy("qid").orderBy(F.col("approx").desc(), F.col("vid"))
    cand = scored.withColumn("crank", F.row_number().over(wc)).where(
        F.col("crank") <= mult * k
    )
    cos = _dot(F.col("qval"), F.col("v")) / (_norm(F.col("qval")) * _norm(F.col("v")))
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        cand.select("qid", "vid", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )
