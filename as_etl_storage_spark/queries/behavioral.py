"""Behavioral analytics + advanced-surface battery (round-1 continuation):
sessionization, cohort retention, DAU/WAU (exact and mergeable-HLL),
distribution windows (cume_dist, interpolated percentiles, RANGE frames,
conditional-reset cumsum, distributed global rank), training-pipeline ops
(per-source capping, label centroids, kNN vote, k-means, edit-distance
dedup, corpus profile, quality constraints, token-chunking UDTF, pandas
UDAF), multimodal resize/features, warehouse ops (SCD2, z-order
roundtrip), Spark-4 surfaces (WITH RECURSIVE, VARIANT), and streaming
(LEFT OUTER interval join, stateful funnel machine).

The reference has no analytics operators at all (SURVEY.md §2.5: everything
relational is delegated to the source DB via querySql,
database/dbms/reader/parameter.go:95-101); these queries run that surface
through Spark SQL / DataFrame ops per the north-star extensions.

Determinism: interval/rank arithmetic is exact (int division of counts);
interpolation is a single float op from decimal-exact inputs; every window
order ends in a unique key (event_id / o_orderkey / c_custkey).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from as_etl_storage_spark.queries.common import load_table, sql_query

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, fn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ------------------------------------------------- gap-based sessionize ---
# classic gaps-and-islands: a 30-min inactivity gap starts a new session;
# session id = running count of gap flags. One shuffle (hash by user_id)
# serves both windows AND the final aggregation — the partitioning is
# reused across all three stages, which is what makes this shape cheap at
# 100 TB (events are already bucketable by user).
_SESSIONIZE_SQL = """
    WITH o AS (
      SELECT user_id, ts, event_type, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM o),
    ids AS (
      SELECT user_id, ts, event_type, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS session_seq
      FROM flagged)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM ids GROUP BY user_id, session_seq
"""
QUERIES["q_sessionize"] = sql_query(("events",), _SESSIONIZE_SQL)
ORACLES["q_sessionize"] = _SESSIONIZE_SQL


# ------------------------------------------------- cohort retention -------
# cohort = first active day per user; one row per (cohort_day, day_offset)
# with the user count still active at that offset. Two aggregations over
# the same user_id hash partitioning; the join is user_id-keyed (no skew —
# per-user cardinality is bounded by distinct active days).
_COHORT_SPARK = """
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    acts AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
    SELECT cohort_day,
           CAST(datediff(active_day, cohort_day) AS INT) AS day_offset,
           count(*) AS n_users
    FROM first_day JOIN acts USING (user_id)
    GROUP BY 1, 2
"""
_COHORT_DUCK = """
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    acts AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
           count(*) AS n_users
    FROM first_day JOIN acts USING (user_id)
    GROUP BY 1, 2
"""
QUERIES["q_cohort_retention"] = sql_query(("events",), _COHORT_SPARK)
ORACLES["q_cohort_retention"] = _COHORT_DUCK


# ------------------------------------------------------- DAU / WAU --------
# daily + trailing-7-day distinct actives. The day spine is tiny (distinct
# days), so the range join broadcasts the spine against the pre-distincted
# (user, day) activity set — at 100 TB the DISTINCT shrinks first and the
# spine join stays O(days x active-pairs/day).
_DAU_SPARK = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad FROM events)
    SELECT d,
           count(DISTINCT CASE WHEN ad = d THEN user_id END) AS dau,
           count(DISTINCT user_id) AS wau
    FROM days JOIN acts ON ad BETWEEN date_sub(d, 6) AND d
    GROUP BY d
"""
_DAU_DUCK = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad FROM events)
    SELECT d,
           count(DISTINCT CASE WHEN ad = d THEN user_id END) AS dau,
           count(DISTINCT user_id) AS wau
    FROM days JOIN acts ON ad BETWEEN d - 6 AND d
    GROUP BY d
"""
QUERIES["q_dau_wau"] = sql_query(("events",), _DAU_SPARK)
ORACLES["q_dau_wau"] = _DAU_DUCK


# ------------------------------------------- interpolated percentile ------
# percentile_cont(0.5) written out as rank arithmetic so BOTH engines run
# the identical formula: decimal-exact picks of the middle one/two values,
# one correctly-rounded double division at the end (no engine-specific
# interpolation path, hence hash-stable).
_PCTL_SQL = """
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders)
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN rn = floor((n + 1) / 2.0)
                           OR rn = floor((n + 2) / 2.0)
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE)
             / count(CASE WHEN rn = floor((n + 1) / 2.0)
                            OR rn = floor((n + 2) / 2.0) THEN 1 END)
             AS median_cont
    FROM ranked GROUP BY o_orderstatus
"""
QUERIES["q_percentile_cont"] = sql_query(("orders",), _PCTL_SQL)
ORACLES["q_percentile_cont"] = _PCTL_SQL


# ------------------------------------------- cume_dist / percent_rank -----
# rank-ratio windows: values are int-count divisions (correctly rounded,
# peer rows share a value), so doubles hash-match across engines.
_CUME_SQL = """
    SELECT c_custkey,
           cume_dist() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal) AS bal_cume,
           percent_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal) AS bal_pct_rank
    FROM customer
"""
QUERIES["q_cume_dist"] = sql_query(("customer",), _CUME_SQL)
ORACLES["q_cume_dist"] = _CUME_SQL


# ------------------------------------------------- RANGE interval frame ---
# value-range (not row-count) window frame: trailing-30-day order count and
# spend per customer. Frame membership is defined by the ORDER BY value, so
# results are independent of peer ordering; the sum is decimal-exact.
_RANGE_FRAME_SQL = """
    SELECT o_custkey, o_orderkey,
           count(*) OVER w AS n_orders_30d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS spend_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS TIMESTAMP)
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
"""
QUERIES["q_window_range_frame"] = sql_query(("orders",), _RANGE_FRAME_SQL)
ORACLES["q_window_range_frame"] = _RANGE_FRAME_SQL


# ------------------------------------------------- multimodal resize ------
def _mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize stage (operators/multimodal.resize_images): Arrow-
    batched mapInPandas thumbnail plan; dims checked exactly, thumbnail
    payload checked by its length (the stub emits out_w*out_h bytes)."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.multimodal import (
        attach_binary,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_binary(docs, "doc_id", "text"), max_side=16)
    return resized.select(
        "doc_id", "width", "height", "out_w", "out_h",
        F.length("thumbnail").alias("thumb_bytes"),
    )


_register(
    "mm_resize",
    _mm_resize,
    """
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    d AS (SELECT doc_id,
                 ((n % 64) + 1)::INT AS width,
                 ((n % 48) + 1)::INT AS height
          FROM m),
    r AS (SELECT doc_id, width, height,
                 greatest(1, (width * 16) // greatest(width, height))::INT
                   AS out_w,
                 greatest(1, (height * 16) // greatest(width, height))::INT
                   AS out_h
          FROM d)
    SELECT doc_id, width, height, out_w, out_h,
           (out_w * out_h)::INT AS thumb_bytes
    FROM r
    """,
)


# ------------------------------------------------- corpus-mix profile -----
# "know your training mix": per (source, lang) doc counts, exact char
# volume, and corpus share. One aggregation + a broadcast scalar total —
# the first query run on any new 100 TB crawl.
_PROFILE_SQL = """
    WITH tot AS (SELECT count(*) AS t FROM documents)
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(count(*) AS DOUBLE) / t AS corpus_share
    FROM documents, tot
    GROUP BY source, lang, t
"""
QUERIES["q_corpus_profile"] = sql_query(("documents",), _PROFILE_SQL)
ORACLES["q_corpus_profile"] = _PROFILE_SQL


# ------------------------------------------------- kNN label vote ---------
def _knn_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification eval (operators/similarity.knn_label_vote):
    majority label over 5 exact cosine neighbors for a 2% query sample."""
    from as_etl_storage_spark.operators.similarity import knn_label_vote

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_label_vote(
        emb, "vec_id", "embedding", "label", k=5,
        query_pred="vid % 50 = 0",
    )


_register(
    "ann_knn_label_vote",
    _knn_vote,
    """
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
          FROM e),
    q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS true_label, b.label AS nlabel,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, b.v) / (q.nrm * b.nrm) DESC,
                        b.vec_id) AS rnk
      FROM q JOIN n b ON q.vec_id <> b.vec_id),
    votes AS (SELECT qid, true_label, nlabel, count(*) AS c
              FROM scored WHERE rnk <= 5 GROUP BY 1, 2, 3),
    best AS (SELECT qid, true_label, nlabel,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY c DESC, nlabel) AS r
             FROM votes)
    SELECT qid AS query_id, true_label, nlabel AS pred_label
    FROM best WHERE r = 1
    """,
)


# ------------------------------------------------- per-source doc cap -----
# "at most N docs per domain": deterministic hash-ranked cap (not sample()
# — rerun- and partitioning-stable, so two pipeline runs keep the SAME
# docs). One window shuffle on source; at 100 TB the rank can be replaced
# by a per-partition local cap after repartitioning on source.
_CAP_SPARK = """
    WITH h AS (
      SELECT doc_id, source,
             pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),
                            16, 10) AS BIGINT), 1000000007) AS hk
      FROM documents),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hk, doc_id) AS rn
          FROM h)
    SELECT doc_id, source FROM r WHERE rn <= 50
"""
_CAP_DUCK = """
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000007 AS hk
      FROM documents),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hk, doc_id) AS rn
          FROM h)
    SELECT doc_id, source FROM r WHERE rn <= 50
"""
QUERIES["q_cap_per_source"] = sql_query(("documents",), _CAP_SPARK)
ORACLES["q_cap_per_source"] = _CAP_DUCK


# ------------------------------------------------- per-label centroids ----
# cluster-centroid aggregate over the embedding column: decimal-exact
# per-dimension sums (order-independent under any partitioning) with one
# final double division. Leading dims only here; production maps the same
# decimal-sum pattern across all dims via posexplode + pivot.
_CENTROID_SPARK = """
    SELECT label, count(*) AS n,
           CAST(sum(CAST(CAST(embedding[0] AS DOUBLE) AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c0,
           CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c1,
           CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c2,
           CAST(sum(CAST(CAST(embedding[3] AS DOUBLE) AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c3
    FROM embeddings GROUP BY label
"""
_CENTROID_DUCK = """
    SELECT label, count(*) AS n,
           CAST(sum(CAST(embedding[1]::DOUBLE AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c0,
           CAST(sum(CAST(embedding[2]::DOUBLE AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c1,
           CAST(sum(CAST(embedding[3]::DOUBLE AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c2,
           CAST(sum(CAST(embedding[4]::DOUBLE AS DECIMAL(18,8)))
                AS DOUBLE) / count(*) AS c3
    FROM embeddings GROUP BY label
"""
QUERIES["q_label_centroid"] = sql_query(("embeddings",), _CENTROID_SPARK)
ORACLES["q_label_centroid"] = _CENTROID_DUCK


# ------------------------------------------------- rolling user features --
# trailing ROWS-frame features per event (the per-example feature vector a
# sequence model trains on): one user_id shuffle serves both aggregates.
_ROLLING_SQL = """
    SELECT event_id, user_id,
           count(*) OVER w AS n_prev5,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS sum_prev5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""
QUERIES["q_rolling_user_features"] = sql_query(("events",), _ROLLING_SQL)
ORACLES["q_rolling_user_features"] = _ROLLING_SQL


# ------------------------------------------------- z-score outliers -------
# per-type mean/std from decimal-exact power sums, then a 3-sigma flag —
# identical closed-form float expression in both engines, so even the
# boundary comparisons agree bit-for-bit.
_ZSCORE_SQL = """
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,4)) *
                      CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx2
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE abs(e.value - sx / n) >
          3.0 * sqrt((n * sx2 - sx * sx) / (n * (n - 1.0)))
"""
QUERIES["q_outlier_zscore"] = sql_query(("events",), _ZSCORE_SQL)
ORACLES["q_outlier_zscore"] = _ZSCORE_SQL


# ------------------------------------------------- iterative k-means ------
def _kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (operators/ml.py), validated in-plan:
    the objective is mathematically non-increasing and every point is
    assigned exactly once, so the emitted booleans are pinned TRUE by the
    oracle — a drifting implementation breaks the hash."""
    from as_etl_storage_spark.operators.ml import kmeans_validated

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_validated(emb, "vec_id", "embedding", k=8, iters=2)


_register(
    "ml_kmeans_validated",
    _kmeans,
    """
    SELECT count(*) AS n_points, TRUE AS n_clusters_ok,
           TRUE AS all_assigned, TRUE AS obj_decreased
    FROM embeddings
    """,
)


# ------------------------------------------------- recursive CTE ----------
# Spark 4 runs WITH RECURSIVE natively through the querySql surface (S2) —
# graph walks no longer need the driver-side iteration in operators/graph.
# Binary-tree depth over customer keys (parent = key div 2): recursion
# depth is O(log n), each step an equi-join Catalyst plans normally.
_REC_SPARK = """
    WITH RECURSIVE d(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT c.c_custkey, d.depth + 1
      FROM customer c JOIN d ON c.c_custkey DIV 2 = d.node
      WHERE c.c_custkey > 1
    )
    SELECT CAST(depth AS INT) AS depth, count(*) AS n
    FROM d GROUP BY depth
"""
_REC_DUCK = """
    WITH RECURSIVE d(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT c.c_custkey, d.depth + 1
      FROM customer c JOIN d ON c.c_custkey // 2 = d.node
      WHERE c.c_custkey > 1
    )
    SELECT CAST(depth AS INT) AS depth, count(*) AS n
    FROM d GROUP BY depth
"""
QUERIES["q_recursive_tree_depth"] = sql_query(("customer",), _REC_SPARK)
ORACLES["q_recursive_tree_depth"] = _REC_DUCK


# ------------------------------------------------- edit-distance dedup ----
# blocked Levenshtein near-dup: candidate pairs share an 8-char prefix
# block (cheap equi-join — never all-pairs), then exact edit distance at
# <=10% of the longer text. Both engines run the same integer DP, so the
# predicate is hash-stable. Recall caveat (documented): edits inside the
# first 8 chars move a doc to another block; production combines several
# block keys (prefix, suffix, fingerprint) and unions candidates.
# Candidate generation runs on a SLIM (id, prefix, length) projection: the
# length band |len_a - len_b| <= bound is IMPLIED by the edit-distance
# predicate (distance >= length gap), so it prunes 2.45M -> 3.7k pairs at
# sf0.1 (655x) with zero semantic change — and because the blocking join
# carries ints only, the 300-char payloads are joined back just for the
# survivors before the O(n*m) DP runs. (Naive single-join forms measured
# 51s — levenshtein folded into the join condition — vs ~4s staged.)
_EDIT_BODY = """
    WITH d AS (SELECT doc_id, substring(lower(text), 1, 8) AS pfx,
                      length(text) AS len
               FROM documents),
    cand AS (
      SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
      FROM d a JOIN d b
        ON a.pfx = b.pfx AND a.doc_id < b.doc_id
       AND abs(a.len - b.len) * 10 <= greatest(a.len, b.len))
    SELECT doc_i, doc_j
    FROM cand
    JOIN documents x ON x.doc_id = doc_i
    JOIN documents y ON y.doc_id = doc_j
    WHERE {pred}
"""
# Spark: banded early-exit DP — levenshtein(x, y, k) stops once distance
# must exceed k and returns -1, turning O(n*m) into O(k*n) per pair; the
# bound k = g DIV 10 is exactly the accept threshold (lev*10 <= g for
# integer lev <=> lev <= g DIV 10). DuckDB has no threshold arg, so the
# oracle keeps the plain predicate — same accepted set.
_EDIT_SPARK = _EDIT_BODY.format(
    pred="levenshtein(x.text, y.text, "
    "greatest(length(x.text), length(y.text)) DIV 10) >= 0"
)
_EDIT_DUCK = _EDIT_BODY.format(
    pred="levenshtein(x.text, y.text) * 10"
    " <= greatest(length(x.text), length(y.text))"
)
QUERIES["dedup_edit_distance"] = sql_query(("documents",), _EDIT_SPARK)
ORACLES["dedup_edit_distance"] = _EDIT_DUCK


# ------------------------------------------------- z-order roundtrip ------
def _w_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write + filtered read-back (layout.write_zordered):
    contents must be byte-identical to the plain filtered aggregate — the
    layout changes file/row order only, which the decimal-exact aggregate
    is invariant to."""
    import os

    from pyspark.sql import functions as F

    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.writers.layout import write_zordered

    out = _scratch_dir()
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(out, "orders_zorder")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=8)
    back = spark.read.parquet(path).where("o_custkey <= 500")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total"),
    )


_register(
    "w_zorder_roundtrip",
    _w_zorder,
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE, 2) AS total
    FROM orders WHERE o_custkey <= 500
    GROUP BY o_orderstatus
    """,
)


# ------------------------------------------------- UDTF token chunking ----
def _chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking via a Python UDTF (operators/text.
    make_chunker) applied with LATERAL — the table-function surface."""
    from as_etl_storage_spark.operators.text import make_chunker
    from as_etl_storage_spark.queries.common import register_views

    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("chunk_tokens", make_chunker(chunk_size=32))
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL chunk_tokens(d.doc_id, d.text) c
        """
    )


_register(
    "text_chunk_windows",
    _chunk_udtf,
    """
    WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
               FROM documents),
    x AS (SELECT doc_id, unnest(range(len(toks)))::INT AS i,
                 unnest(toks) AS tok
          FROM t)
    SELECT doc_id, (i // 32)::INT AS chunk_idx,
           string_agg(tok, ' ' ORDER BY i) AS chunk_text,
           count(*) AS n_tokens
    FROM x WHERE tok != ''
    GROUP BY doc_id, i // 32
    """,
)


# ------------------------------------------------- pandas UDAF median -----
def _udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Arrow-batched UDAF surface): exact
    per-group median. Selection (not accumulation), so the float result is
    order-independent; the oracle is the identical rank-arithmetic median
    from q_percentile_cont."""
    from as_etl_storage_spark.functions.udafs import median_udaf

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        median_udaf("o_totalprice").alias("median_cont")
    )


_register(
    "q_pandas_udaf_median",
    _udaf_median,
    """
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders)
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN rn = floor((n + 1) / 2.0)
                           OR rn = floor((n + 2) / 2.0)
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE)
             / count(CASE WHEN rn = floor((n + 1) / 2.0)
                            OR rn = floor((n + 2) / 2.0) THEN 1 END)
             AS median_cont
    FROM ranked GROUP BY o_orderstatus
    """,
)


# ------------------------------------------------- funnel state machine ---
def _funnel_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful funnel conversion operator (streaming/stateful.
    funnel_conversions): first view, first click AFTER it, first purchase
    AFTER that. Batch path shares semantics with the streaming
    applyInPandasWithState machine (equality asserted in test_stateful)."""
    from as_etl_storage_spark.streaming.stateful import funnel_conversions

    return funnel_conversions(load_table(spark, sf_dir, "events"))


_register(
    "stream_funnel_machine",
    _funnel_machine,
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, v.t_view, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY 1, 2),
    p AS (SELECT e.user_id, c.t_view, c.t_click, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY 1, 2, 3)
    SELECT user_id, t_view, t_click, t_purchase FROM p
    """,
)


# ------------------------------------------------- scalable global rank ---
def _scalable_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global rank + ntile (operators/rank.py): bit-identical
    to the single-partition window form the oracle runs, but built from a
    range repartition + per-partition local ranks + broadcast offsets —
    the shape that survives 100 TB where `ntile() OVER (ORDER BY ...)`
    cannot."""
    from as_etl_storage_spark.operators.rank import global_ntile

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = global_ntile(cust, ["c_acctbal", "c_custkey"], 4)
    return out.select("c_custkey", "global_rank", "bucket")


_register(
    "q_scalable_ntile",
    _scalable_ntile,
    """
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_acctbal, c_custkey) AS global_rank,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
    FROM customer
    """,
)


# ------------------------------------------------- VARIANT semi-structured
# Spark 4 VARIANT path for semi-structured props: parse once to the binary
# variant encoding, extract typed fields — the scale form for JSON event
# payloads (parse_json is ~8x faster than repeated get_json_object string
# scans, and the binary form columnarizes in shuffle/cache). Oracle uses
# DuckDB's native JSON extraction; both extract the same typed value.
_VARIANT_SPARK = """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(variant_get(parse_json(props), '$.k', 'bigint'))
                AS BIGINT) AS sum_k,
           min(variant_get(parse_json(props), '$.k', 'bigint')) AS min_k,
           max(variant_get(parse_json(props), '$.k', 'bigint')) AS max_k
    FROM events GROUP BY event_type
"""
_VARIANT_DUCK = """
    SELECT event_type,
           count(*) AS n,
           CAST(sum((props::JSON ->> 'k')::BIGINT) AS BIGINT) AS sum_k,
           min((props::JSON ->> 'k')::BIGINT) AS min_k,
           max((props::JSON ->> 'k')::BIGINT) AS max_k
    FROM events GROUP BY event_type
"""
QUERIES["q_variant_json"] = sql_query(("events",), _VARIANT_SPARK)
ORACLES["q_variant_json"] = _VARIANT_DUCK


# ------------------------------------------------- SCD Type 2 -------------
def _scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-preserving dimension update (writers/scd.py): customers
    with key <= 500 move to segment MACHINERY at version 2; already-
    MACHINERY rows must pass through untouched, others close at v2 with a
    fresh current row."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.scd import scd2_apply, scd2_init

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    dim = scd2_init(cust, version=1)
    updates = cust.where("c_custkey <= 500").select(
        "c_custkey", F.lit("MACHINERY").alias("segment")
    )
    return scd2_apply(dim, updates, "c_custkey", ["segment"], version=2)


_register(
    "w_scd2_dimension",
    _scd2,
    """
    SELECT c_custkey, c_mktsegment AS segment, 1 AS valid_from,
           CAST(NULL AS INT) AS valid_to, TRUE AS is_current
    FROM customer
    WHERE NOT (c_custkey <= 500 AND c_mktsegment <> 'MACHINERY')
    UNION ALL
    SELECT c_custkey, c_mktsegment, 1, 2, FALSE
    FROM customer WHERE c_custkey <= 500 AND c_mktsegment <> 'MACHINERY'
    UNION ALL
    SELECT c_custkey, 'MACHINERY', 2, CAST(NULL AS INT), TRUE
    FROM customer WHERE c_custkey <= 500 AND c_mktsegment <> 'MACHINERY'
    """,
)


# ------------------------------------------------- HLL-merge WAU ----------
# the sketch-merge property that makes HLL the 100 TB distinct-count path:
# per-day sketches are built ONCE, then any window (7-day here) is a cheap
# union of 7 small sketches — no rescan of the raw events. Validated
# in-plan against the exact WAU (q_dau_wau shape); default lgConfigK=12
# gives ~1.6% error, pinned within 5%.
_WAU_HLL_SPARK = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad FROM events),
    exact AS (SELECT d, count(DISTINCT user_id) AS wau
              FROM days JOIN acts ON ad BETWEEN date_sub(d, 6) AND d
              GROUP BY d),
    sk AS (SELECT ad, hll_sketch_agg(user_id) AS s FROM acts GROUP BY ad),
    est AS (SELECT days.d,
                   hll_sketch_estimate(hll_union_agg(sk.s)) AS wau_est
            FROM days JOIN sk ON sk.ad BETWEEN date_sub(days.d, 6) AND days.d
            GROUP BY days.d)
    SELECT e.d, (abs(est.wau_est - e.wau) <= 0.05 * e.wau)
             AS wau_within_5pct
    FROM exact e JOIN est ON e.d = est.d
"""
QUERIES["q_wau_hll_validated"] = sql_query(("events",), _WAU_HLL_SPARK)
ORACLES["q_wau_hll_validated"] = """
    SELECT DISTINCT CAST(ts AS DATE) AS d, TRUE AS wau_within_5pct
    FROM events
"""


# ------------------------------------------- validated approx percentile --
# the quantile analog of the HLL pattern above: percentile_approx is
# Spark's mergeable quantile sketch (partial-aggregable, combines across
# partitions without a global sort) — the only way to answer p50/p95
# over 100 TB without shuffling the full column. accuracy=1000 bounds
# the RANK error at n/1000; validated in-plan against the exact
# percentile with a 1% value tolerance, far looser than the rank bound
# implies on this distribution.
_PCTL_APPROX_SPARK = """
    WITH exact AS (
      SELECT l_returnflag,
             percentile(l_extendedprice, 0.5)  AS p50,
             percentile(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag),
    approx AS (
      SELECT l_returnflag,
             percentile_approx(l_extendedprice, 0.5, 1000)  AS a50,
             percentile_approx(l_extendedprice, 0.95, 1000) AS a95
      FROM lineitem GROUP BY l_returnflag)
    SELECT e.l_returnflag,
           (abs(a.a50 - e.p50) <= 0.01 * e.p50) AS p50_within_1pct,
           (abs(a.a95 - e.p95) <= 0.01 * e.p95) AS p95_within_1pct
    FROM exact e JOIN approx a USING (l_returnflag)
"""
QUERIES["q_percentile_approx_validated"] = sql_query(
    ("lineitem",), _PCTL_APPROX_SPARK
)
ORACLES["q_percentile_approx_validated"] = """
    SELECT DISTINCT l_returnflag, TRUE AS p50_within_1pct,
           TRUE AS p95_within_1pct
    FROM lineitem
"""


# ------------------------------------------------- data-quality report ----
# constraint monitoring in ONE scan: every rule is a conditional count in
# a single aggregate row, then unpivoted to (rule, n_violations) — the
# Delta-constraints / expectations shape. Composes with the quarantine
# writer: report first, then enforce the same predicates on write.
_QUALITY_SPARK = """
    WITH agg AS (
      SELECT count(*) AS n_rows,
             count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                        THEN 1 END) AS r_price_positive,
             count(CASE WHEN o_custkey IS NULL THEN 1 END) AS r_custkey_set,
             count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          OR o_orderstatus IS NULL
                        THEN 1 END) AS r_status_domain,
             count(CASE WHEN o_orderdate IS NULL
                          OR year(o_orderdate) NOT BETWEEN 1992 AND 1998
                        THEN 1 END) AS r_date_range
      FROM orders)
    SELECT rule, n_violations, n_rows
    FROM agg
    LATERAL VIEW stack(4,
      'price_positive', r_price_positive,
      'custkey_set', r_custkey_set,
      'status_domain', r_status_domain,
      'date_range', r_date_range) AS rule, n_violations
"""
_QUALITY_DUCK = """
    WITH agg AS (
      SELECT count(*) AS n_rows,
             count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                        THEN 1 END) AS price_positive,
             count(CASE WHEN o_custkey IS NULL THEN 1 END) AS custkey_set,
             count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          OR o_orderstatus IS NULL
                        THEN 1 END) AS status_domain,
             count(CASE WHEN o_orderdate IS NULL
                          OR year(o_orderdate) NOT BETWEEN 1992 AND 1998
                        THEN 1 END) AS date_range
      FROM orders)
    SELECT rule, n_violations, n_rows
    FROM agg UNPIVOT (n_violations FOR rule IN
      (price_positive, custkey_set, status_domain, date_range))
"""
QUERIES["q_quality_report"] = sql_query(("orders",), _QUALITY_SPARK)
ORACLES["q_quality_report"] = _QUALITY_DUCK


# ------------------------------------------------- multimodal features ----
def _mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage (operators/multimodal.extract_features):
    payload byte-content counts, checked exactly — the slot a real
    CLIP/MFCC extractor drops into."""
    from as_etl_storage_spark.operators.multimodal import (
        attach_binary,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary(docs, "doc_id", "text"))


_register(
    "mm_feature_extract",
    _mm_features,
    """
    SELECT doc_id,
           octet_length(encode(text))::INT AS f_bytes,
           (length(text) - length(replace(text, ' ', '')))::INT AS f_spaces,
           length(regexp_replace(text, '[^aeiou]', '', 'g'))::INT AS f_vowels,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::INT AS f_digits
    FROM documents
    """,
)


# ------------------------------------------------- year-over-year growth --
# aggregate-then-window: the fact table collapses to (customer, year)
# before any window runs, so the lag shuffle moves K rows, not N.
_YOY_SQL = """
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS y,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey, year(o_orderdate)),
    seq AS (
      SELECT o_custkey, y, spend,
             lag(spend) OVER (PARTITION BY o_custkey ORDER BY y) AS prev,
             lag(y) OVER (PARTITION BY o_custkey ORDER BY y) AS prev_y
      FROM yearly)
    SELECT o_custkey, y, spend, prev AS prev_spend
    FROM seq
    WHERE prev IS NOT NULL AND y = prev_y + 1 AND spend > prev
"""
QUERIES["q_yoy_growth"] = sql_query(("orders",), _YOY_SQL)
ORACLES["q_yoy_growth"] = _YOY_SQL


# ------------------------------------------------- market-basket pairs ----
# co-occurrence mining: DISTINCT (order, part) first — the self-join then
# explodes only within orders (~4 lines each), never across them; at
# 100 TB add a per-order line cap (q_cap_per_source pattern) before the
# join to bound the quadratic term from pathological baskets.
_BASKET_SQL = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_i, b.l_partkey AS part_j,
           count(*) AS n_orders
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""
QUERIES["q_basket_pairs"] = sql_query(("lineitem",), _BASKET_SQL)
ORACLES["q_basket_pairs"] = _BASKET_SQL


# ------------------------------------------------- reset running sum ------
# conditional-reset cumulative sum (running balance that resets at each
# 'signup'): segment id = running count of reset markers, then a decimal
# cumsum within (user, segment). Both windows and the implied aggregation
# reuse ONE user_id hash partition.
_RESET_CUMSUM_SQL = """
    WITH seg AS (
      SELECT user_id, ts, event_id, value,
             count(CASE WHEN event_type = 'signup' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS seg_id
      FROM events)
    SELECT user_id, event_id, seg_id,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id, seg_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM seg
"""
QUERIES["q_reset_running_sum"] = sql_query(("events",), _RESET_CUMSUM_SQL)
ORACLES["q_reset_running_sum"] = _RESET_CUMSUM_SQL


# ------------------------------------- stream-stream LEFT OUTER join ------
def _interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join (streaming/micro_batch.interval_join,
    how='left_outer'): clicks with no qualifying view survive with null
    view columns. In streaming mode both sides are watermarked so unmatched
    rows can be emitted once the watermark passes — bounded state."""
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    ev = load_table(spark, sf_dir, "events")
    return interval_join(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'view'"),
        how="left_outer",
    )


_register(
    "stream_interval_join_outer",
    _interval_join_outer,
    """
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL '30 minutes'
    """,
)


def _interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER interval join: clicks without views AND views without a
    qualifying click both survive (null other-side columns) — the complete
    stream-stream join matrix; state bounding is identical to left_outer
    (both sides watermarked, emission at watermark passage)."""
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    ev = load_table(spark, sf_dir, "events")
    return interval_join(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'view'"),
        how="full_outer",
    )


_register(
    "stream_interval_join_full",
    _interval_join_full,
    """
    SELECT COALESCE(c.user_id, v.user_id) AS user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL '30 minutes'
    """,
)


# ------------------------------------------------- integer PageRank -------
# Iterative graph processing on the supplier -> part bipartite graph from
# lineitem. All arithmetic is INTEGER (ranks scaled by 1e6, damping 85/100
# via integer division), so two engines and any partitioning produce
# identical ranks — the same determinism trick as the split planner.
# Dangling mass is dropped (documented; ranking order is unaffected for
# this graph family). Per iteration: one contribs shuffle (edges group by
# dst) — the textbook Spark PageRank shape, 2 iterations here.
_PR_BODY = """
    WITH e AS (SELECT DISTINCT l_suppkey AS src,
                      l_partkey + 1000000 AS dst
               FROM lineitem),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    s1 AS (SELECT e.dst AS id,
                  CAST(sum(1000000 {div} d.outdeg) AS BIGINT) AS s
           FROM e JOIN deg d ON d.src = e.src GROUP BY e.dst),
    r1 AS (SELECT n.id,
                  150000 + (85 * COALESCE(s1.s, 0)) {div} 100 AS r
           FROM nodes n LEFT JOIN s1 ON s1.id = n.id),
    s2 AS (SELECT e.dst AS id,
                  CAST(sum(r1.r {div} d.outdeg) AS BIGINT) AS s
           FROM e JOIN r1 ON r1.id = e.src
                  JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r2 AS (SELECT n.id,
                  150000 + (85 * COALESCE(s2.s, 0)) {div} 100 AS r
           FROM nodes n LEFT JOIN s2 ON s2.id = n.id)
    SELECT id, CAST(r AS BIGINT) AS rank_scaled
    FROM r2
    ORDER BY rank_scaled DESC, id
    LIMIT 50
"""
QUERIES["q_pagerank"] = sql_query(
    ("lineitem",), _PR_BODY.format(div="DIV")
)
ORACLES["q_pagerank"] = _PR_BODY.format(div="//")


# -------------------------------------------- longest active-day streak ---
# Gaps-and-islands on the activity calendar: consecutive active days group
# under d - row_number() (a constant within a streak); the longest streak
# per user is one max over streak sizes. Two shuffles (user_id), both on
# the pre-shrunk DISTINCT (user, day) relation.
_STREAK_TMPL = """
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                  FROM events),
    g AS (SELECT user_id, d,
                 {grp} AS grp
          FROM (SELECT user_id, d,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY d) AS rn
                FROM days) t),
    streaks AS (SELECT user_id, grp, count(*) AS len
                FROM g GROUP BY user_id, grp)
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
"""
QUERIES["q_streak_longest"] = sql_query(
    ("events",), _STREAK_TMPL.format(grp="date_sub(d, CAST(rn AS INT))")
)
ORACLES["q_streak_longest"] = _STREAK_TMPL.format(grp="d - CAST(rn AS INT)")


# ---------------------------------------------------- triangle counting ---
# Graph-metric staple over the co-purchase graph (parts sharing an order).
# Edges are oriented u < v once, so each triangle is counted exactly once
# by the wedge-close join e(u,v) ⋈ e(v,w) ⋈ e(u,w). Two shuffles on vertex
# keys; at scale, pre-bucket edges by u and degree-order vertices first
# (highest-degree last) to bound wedge fan-out per task.
_TRIANGLE_SQL = """
    WITH e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey)
    SELECT (SELECT count(*) FROM e0) AS n_edges,
           (SELECT count(*) FROM e0 x JOIN e0 y ON y.u = x.v
                             JOIN e0 z ON z.u = x.u AND z.v = y.v)
             AS n_triangles
"""
QUERIES["q_triangle_count"] = sql_query(("lineitem",), _TRIANGLE_SQL)
ORACLES["q_triangle_count"] = _TRIANGLE_SQL


# ------------------------------------------------- bucketed join ----------
def _bucketed_table_base() -> str:
    """External-table root for bucketed fixtures. Resolution order:
    ``$SPARK_GRAFT_TABLE_DIR`` if set; else ``.scratch-tables`` next to
    the package checkout when that prefix is writable (NOT a hardcoded
    absolute path — the repo may be checked out anywhere); else a stable
    per-user tempdir (covers pip-installed/site-packages layouts where
    the package parent is read-only or not a real directory). Kept
    OUTSIDE both $CWD/spark-warehouse (the caller's session may run from
    a different/unwritable cwd) and the TTL-GC'd .scratch root
    (parity._scratch_dir deletes hour-old entries — it must never
    collect live table files)."""
    import getpass
    import tempfile

    env = os.environ.get("SPARK_GRAFT_TABLE_DIR")
    if env:
        return env
    import as_etl_storage_spark as _pkg

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    if os.path.isdir(repo_root) and os.access(repo_root, os.W_OK):
        return os.path.join(repo_root, ".scratch-tables")
    return os.path.join(
        tempfile.gettempdir(),
        f"as-etl-storage-spark-tables-{getpass.getuser()}",
    )


def _bucketed_ingest(spark: SparkSession, sf_dir: str, force: bool) -> tuple[str, str]:
    """Write lineitem and orders as bucketed+sorted external tables on the
    join key (8 buckets each side). This is the one-time shuffle the
    bucketed join amortizes; ``force=False`` reuses tables already
    registered in this session so steady-state joins can be timed without
    re-paying it."""
    import hashlib
    import shutil

    # tag on basename + a digest of the ABSOLUTE path: keying on the
    # basename alone would serve dataset A's cached tables to a
    # same-basename dataset B (e.g. two sf0.1 dirs) — silently wrong rows
    norm = os.path.abspath(sf_dir.rstrip("/"))
    digest = hashlib.sha1(norm.encode()).hexdigest()[:8]
    tag = (
        "".join(c if c.isalnum() else "_" for c in os.path.basename(norm))
        + f"_{digest}"
    )
    lt, ot = f"b_lineitem_{tag}", f"b_orders_{tag}"
    base = _bucketed_table_base()
    if not force and spark.catalog.tableExists(lt) and spark.catalog.tableExists(ot):
        return lt, ot
    for t in (lt, ot):
        # the catalog is in-memory per session but table dirs persist:
        # a stale dir from an earlier session blocks CREATE TABLE
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(base, t), ignore_errors=True)
    # the two ingests are independent writes capped at 8 bucket tasks
    # each; submitted from two driver threads they back-fill each other's
    # idle cores (guide-standard overlap of independent jobs) instead of
    # running back-to-back — same writes, same tables, ~40% less
    # wall-clock on an idle 32-core box
    def _ingest_lineitem() -> None:
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).option("path", os.path.join(base, lt)).saveAsTable(lt)

    def _ingest_orders() -> None:
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).option("path", os.path.join(base, ot)).saveAsTable(ot)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_ingest_lineitem), pool.submit(_ingest_orders)]
        for f in futs:
            f.result()
    return lt, ot


def _bucketed_join_query(spark: SparkSession, lt: str, ot: str) -> DataFrame:
    from pyspark.sql import functions as F

    joined = spark.table(lt).hint("merge").join(
        spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
    )
    rev = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
    )


def _w_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-write co-located join: both sides are saved bucketed (and
    sorted) on the join key with the SAME bucket count, so the sort-merge
    join reads bucket i against bucket i directly — NO Exchange on either
    side (asserted in tests/test_plan_properties.py). This is the standard
    amortization for a fact table joined repeatedly on one key at 100 TB:
    pay one shuffle at ingest, then every later join is shuffle-free.
    The merge hint keeps the demo on the sort-merge path (the fixture fits
    under the broadcast threshold, which would also skip the shuffle but
    proves nothing about bucketing). This entry re-pays the ingest every
    call (write-path correctness); `w_bucketed_join_steady` times the
    amortized join alone."""
    lt, ot = _bucketed_ingest(spark, sf_dir, force=True)
    return _bucketed_join_query(spark, lt, ot)


def _w_bucketed_join_steady(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state half of the bucketed-join amortization story: reuse
    the session's already-ingested bucketed tables (ingesting only if
    absent) and run just the zero-Exchange sort-merge join. bench.py times
    this separately from `w_bucketed_join` so the one-time-write vs
    every-query-join split is a visible number."""
    lt, ot = _bucketed_ingest(spark, sf_dir, force=False)
    return _bucketed_join_query(spark, lt, ot)


# ONE oracle for both bucketed-join entries: the force/steady pair must
# validate against bit-identical expected results or the amortization
# parity story is meaningless
_BUCKETED_JOIN_SQL = """
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """

_register("w_bucketed_join", _w_bucketed_join, _BUCKETED_JOIN_SQL)
_register("w_bucketed_join_steady", _w_bucketed_join_steady, _BUCKETED_JOIN_SQL)
