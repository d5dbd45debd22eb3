"""Property-based operator tests (hypothesis): as-of join vs a brute-force
reference, connected components vs a pure-Python union-find — random inputs
catch the cases fixtures never contain."""

from __future__ import annotations

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st

from as_etl_storage_spark.operators.asof import asof_join
from as_etl_storage_spark.operators.graph import connected_components

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs; keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=4, unique=True))
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 100)),
            min_size=1,
            max_size=12,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 100)),
            min_size=0,
            max_size=12,
        )
    )
    return left, right


@given(asof_case())
@settings(**_SETTINGS)
def test_asof_matches_bruteforce(spark, case):
    left, right = case
    # make right rows unique per (key, time): duplicates make the expected
    # payload ambiguous (both are "the latest"); dedupe keeps the max payload
    rmap = {}
    for i, (k, t) in enumerate(right):
        rmap[(k, t)] = max(rmap.get((k, t), -1), 1000 + i)
    right_rows = [(k, t, p) for (k, t), p in rmap.items()]
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(right_rows, "k long, rt long, payload long")
    got = {
        (r["lid"]): r["payload"]
        for r in asof_join(ldf, rdf, "k", "t", "rt", ["payload"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (kk, rt, p) in right_rows if kk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"left row {i} key={k} t={t}"


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # compress to component minimum
    return {x: find(x) for x in parent}


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_i long, doc_j long")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_vectorized_cosine_topk_matches_jvm(spark):
    """The numpy-matmul ANN variant must agree with the JVM fold baseline
    on the fixture (summation-order ulp flips would need near-exact ties,
    which the fixture's cosine margins rule out)."""
    from as_etl_storage_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_vectorized,
    )
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = cosine_topk(emb, "vec_id", "embedding", 5, "vid % 10 = 0")
    b = cosine_topk_vectorized(emb, "vec_id", "embedding", 5, "vid % 10 = 0")
    sa = sorted(map(tuple, a.collect()))
    sb = sorted(map(tuple, b.collect()))
    assert sa == sb and len(sa) > 0


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),  # group
            st.lists(st.sampled_from("ab c"), min_size=0, max_size=12).map("".join),
        ),
        min_size=1,
        max_size=15,
    ),
    st.integers(2, 7),  # budget
)
@settings(**_SETTINGS)
def test_pack_sequences_conserves_tokens(spark, docs, budget):
    """Packing is a partition of the doc stream: token totals and doc
    counts are conserved, every pack respects the id-order concatenation
    (first_doc <= last_doc, packs ordered by first_doc within a group)."""
    from as_etl_storage_spark.operators.text import pack_sequences

    rows = [(i, t, f"g{g}") for i, (g, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    packs = pack_sequences(df, "doc_id", "text", "source", budget).collect()
    # mirror Spark's split(text, '\s+') (java limit -1: trailing empties
    # kept) with re.split, which has the same semantics
    import re

    toks = {i: len(re.split(r"\s+", t)) for i, t, _ in rows}
    assert sum(p["pack_tokens"] for p in packs) == sum(
        toks[i] for i, t, _ in rows
    )
    assert sum(p["n_docs"] for p in packs) == len(rows)
    for g in {r[2] for r in rows}:
        gp = sorted(
            (p for p in packs if p["source"] == g), key=lambda p: p["pack_id"]
        )
        spans = [(p["first_doc"], p["last_doc"]) for p in gp]
        assert all(a <= b for a, b in spans)
        # packs tile the id order: consecutive spans never interleave
        assert all(
            spans[k][1] <= spans[k + 1][0] for k in range(len(spans) - 1)
        )


@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_bigram_total_matches_token_count(spark, token_lists):
    """Sum of all bigram counts (min_count=1) == sum over docs of
    max(len-1, 0) — the bigram builder neither drops nor fabricates."""
    from as_etl_storage_spark.operators.text import bigram_counts

    rows = [(i, " ".join(ts), "s") for i, ts in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = bigram_counts(df, "text", "source", min_count=1).collect()
    want = sum(max(len(ts) - 1, 0) for ts in token_lists if ts)
    assert sum(r["n"] for r in got) == want


def test_ivf_nprobe_recall_monotone(spark, sf_dir):
    # probing more lists can only grow each query's candidate pool, so
    # recall against exact brute-force top-k must be monotone in nprobe
    from as_etl_storage_spark.operators.similarity import cosine_topk, ivf_topk
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, "vec_id", "embedding", 3, "vid >= 0").collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, "vec_id", "embedding", 3, n_centroids=16, nprobe=nprobe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4
    assert r4 > r1  # at sf0.001 wider probing must actually help


def test_rebalance_determinism_and_bounds(spark, sf_dir):
    from as_etl_storage_spark.operators.sampling import (
        rebalance_to_min_group,
        sample_to_rates,
    )
    from as_etl_storage_spark.queries.common import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    a = rebalance_to_min_group(docs, "doc_id", ["source"])
    b = rebalance_to_min_group(docs, "doc_id", ["source"])
    # pure function of doc_id: reruns keep exactly the same rows
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    sizes = dict(
        a.groupBy("source").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    orig = dict(
        docs.groupBy("source").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    n_min = min(orig.values())
    # smallest group keeps everything; no group grows
    assert any(sizes.get(s, 0) == n for s, n in orig.items() if n == n_min)
    assert all(sizes.get(s, 0) <= n for s, n in orig.items())

    # explicit-rate sampling: rate 0 removes the group, rate 1 keeps it
    out = sample_to_rates(
        docs, "doc_id", ["source"], {"src0": 0.0}, default_rate=1.0
    )
    kept = {r["source"] for r in out.select("source").distinct().collect()}
    assert "src0" not in kept
    assert out.count() == docs.where(F.col("source") != "src0").count()


def test_semantic_dedup_seeding_recall_properties(spark):
    """Recall/precision contract of the blocked semantic-dedup family vs
    the exact all-pairs oracle on the fixture: (1) blocked results are a
    subset of all-pairs (precision exact — every candidate is
    cosine-verified at the same threshold); (2) the multi-seed union is a
    superset of the single-seed run (its first seed set IS the single
    run); (3) k-means-trained seeds clear the recall floor the contract
    query pins."""
    from as_etl_storage_spark.operators import dedup
    from as_etl_storage_spark.operators.ml import kmeans_centroids
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    allp = set(
        map(tuple, dedup.embedding_cosine_pairs(
            emb, "vec_id", "embedding", 0.45).collect())
    )
    single = set(
        map(tuple, dedup.semantic_dedup_pairs(
            emb, "vec_id", "embedding", 8, 0.45).collect())
    )
    multi = set(
        map(tuple, dedup.semantic_dedup_pairs_multi(
            emb, "vec_id", "embedding", 8, 2, 0.45).collect())
    )
    cents = kmeans_centroids(emb, "vec_id", "embedding", 8, 2, impl="jvm")
    seeded = set(
        map(tuple, dedup.semantic_dedup_pairs_seeded(
            emb, "vec_id", "embedding", cents, 0.45).collect())
    )
    assert single <= allp and multi <= allp and seeded <= allp
    assert single <= multi
    assert allp and len(seeded & allp) / len(allp) >= 0.25
    # trained seeds must not lose to arbitrary smallest-id seeds here
    # (they align blocks with density modes on this fixture)
    assert len(seeded & allp) >= len(single & allp)


def test_segment_dedup_conserves_segments(spark, sf_dir):
    # every segment is either kept exactly once corpus-wide (its first
    # occurrence) or removed; per-doc kept+removed equals the doc's
    # segment count and global kept equals the distinct-segment count
    from as_etl_storage_spark.operators.dedup import segment_dedup_rebuild
    from as_etl_storage_spark.queries.common import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = segment_dedup_rebuild(docs, "doc_id", "text", seg_tokens=10)
    segs = docs.where("text IS NOT NULL").select(
        "doc_id",
        F.expr(
            "filter(split(text, '\\\\s+'), t -> t != '')"
        ).alias("tk"),
    ).where(F.size("tk") > 0)
    per_doc = {
        r["doc_id"]: -(-r["n"] // 10)  # ceil
        for r in segs.select(
            "doc_id", F.size("tk").alias("n")
        ).collect()
    }
    got = {r["doc_id"]: (r["n_kept"], r["n_removed"]) for r in out.collect()}
    assert set(got) == set(per_doc)
    for d, n_segs in per_doc.items():
        assert sum(got[d]) == n_segs
    n_distinct = (
        segs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, CAST(ceil(size(tk)/10.0) AS INT)-1), "
                    "s -> array_join(slice(tk, s*10+1, 10), ' '))"
                )
            ).alias("seg")
        )
        .distinct()
        .count()
    )
    assert sum(k for k, _ in got.values()) == n_distinct
    # a rebuilt doc never gains tokens
    for r in out.collect():
        assert r["n_kept"] * 10 + 9 >= len([t for t in r["clean_text"].split() if t])


def test_int8_rescore_recall_and_widening(spark, sf_dir):
    # int8 candidate scan + exact rerank: recall vs exact brute force is
    # high at mult=4 and can only improve as the candidate pool widens
    # (the rerank is exact, so wider pools converge to brute force)
    from as_etl_storage_spark.operators.similarity import (
        cosine_topk,
        int8_topk_rescore,
    )
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, "vec_id", "embedding", 3, "vid % 10 = 0").collect()
    }

    def recall(mult):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in int8_topk_rescore(
                emb, "vec_id", "embedding", 3, "vid % 10 = 0", mult=mult
            ).collect()
        }
        return len(got & exact) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r2 <= r8
    assert r8 >= 0.9  # 64-dim int8 with 8x widening is near-exact


def test_bm25_rank_and_monotonicity(spark, sf_dir):
    # ranks are contiguous from 1 with non-increasing scores, every hit
    # contains a query term, and adding a query term never lowers a
    # surviving doc's score (BM25 contributions are non-negative)
    from as_etl_storage_spark.operators.text import bm25_topk
    from as_etl_storage_spark.queries.common import load_table

    docs = load_table(spark, sf_dir, "documents")
    small = bm25_topk(docs, "doc_id", "text", ["spark", "join"], k=500)
    big = bm25_topk(docs, "doc_id", "text", ["spark", "join", "window"], k=500)
    rows = sorted(
        (r["rank"], r["score"], r["doc_id"]) for r in small.collect()
    )
    assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1))
    s_small = {r["doc_id"]: r["score"] for r in small.collect()}
    s_big = {r["doc_id"]: r["score"] for r in big.collect()}
    assert set(s_small) <= set(s_big)
    for d, s in s_small.items():
        assert s_big[d] >= s - 1e-9


def test_global_running_sum_matches_single_partition_window(spark):
    # the two-pass prefix sum must be bit-identical to the plain
    # (single-partition) window for a unique total order
    from pyspark.sql import Window, functions as F

    from as_etl_storage_spark.operators.rank import global_running_sum

    rows = [(i, (i * 37) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    got = {
        r["k"]: r["rs"]
        for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["k"]: r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_negative_samples_properties(spark, sf_dir):
    # every anchor gets <= m negatives (an accidental positive is the only
    # drop), negatives are real corpus ids, never the anchor, and reruns
    # are identical (pure function of ids)
    from as_etl_storage_spark.operators.sampling import negative_samples
    from as_etl_storage_spark.queries.common import load_table

    docs = load_table(spark, sf_dir, "documents")
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    a = negative_samples(docs, "doc_id", "doc_id % 10 = 0", m=3, seed=7)
    rows = a.collect()
    per_anchor = {}
    for r in rows:
        assert r["neg_id"] in ids and r["neg_id"] != r["anchor_id"]
        per_anchor.setdefault(r["anchor_id"], set()).add(r["neg_slot"])
    assert per_anchor and all(len(s) <= 3 for s in per_anchor.values())
    b = {(r["anchor_id"], r["neg_slot"], r["neg_id"]) for r in
         negative_samples(docs, "doc_id", "doc_id % 10 = 0", m=3, seed=7).collect()}
    assert b == {(r["anchor_id"], r["neg_slot"], r["neg_id"]) for r in rows}


def test_negative_samples_predicate_on_non_id_column(spark, sf_dir):
    # anchor_pred may reference ANY df column (the natural contrastive
    # anchor filter is attribute-based, e.g. lang) — the predicate runs
    # on the full frame and only ids semi-join into the ranked index
    from as_etl_storage_spark.operators.sampling import negative_samples
    from as_etl_storage_spark.queries.common import load_table

    docs = load_table(spark, sf_dir, "documents")
    lang = docs.select("lang").where("lang IS NOT NULL").first()["lang"]
    want = {
        r["doc_id"]
        for r in docs.where(docs.lang == lang).select("doc_id").collect()
    }
    out = negative_samples(docs, "doc_id", f"lang = '{lang}'", m=2, seed=3)
    got = {r["anchor_id"] for r in out.collect()}
    # every anchor produced comes from the predicate's rows (an anchor
    # can only vanish entirely if all its picks were accidental positives
    # — impossible for m=2 distinct slots against this corpus size)
    assert got == want


def test_rrf_fuse_empty_rankings_raises(spark):
    import pytest

    from as_etl_storage_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], "doc_id")


def test_temperature_mix_flattens(spark, sf_dir):
    # alpha=0.5 mix: smallest group keeps everything, no group grows,
    # and the kept size tracks sqrt(n_min*n_g) (geometric-mean target);
    # rerun-identical (pure function of ids)
    import math

    from as_etl_storage_spark.operators.sampling import temperature_mix
    from as_etl_storage_spark.queries.common import load_table

    docs = load_table(spark, sf_dir, "documents")
    orig = {
        (r["source"], r["lang"]): r["count"]
        for r in docs.groupBy("source", "lang").count().collect()
    }
    kept_df = temperature_mix(docs, "doc_id", ["source", "lang"])
    kept = {
        (r["source"], r["lang"]): r["count"]
        for r in kept_df.groupBy("source", "lang").count().collect()
    }
    n_min = min(orig.values())
    for g, n in orig.items():
        k = kept.get(g, 0)
        assert k <= n
        if n == n_min:
            assert k == n  # smallest group untouched
        target = math.sqrt(n_min * n)
        # hash-thresholded binomial: allow generous slack on the fixture
        assert abs(k - target) <= max(6, 4 * math.sqrt(target))
    again = {
        (r["source"], r["lang"]): r["count"]
        for r in temperature_mix(docs, "doc_id", ["source", "lang"])
        .groupBy("source", "lang")
        .count()
        .collect()
    }
    assert again == kept


def test_global_running_sum_null_semantics(spark):
    # NULLs must reproduce the single-partition window exactly: the
    # running sum is NULL only while no non-null value has been seen
    from pyspark.sql import Window, functions as F

    from as_etl_storage_spark.operators.rank import global_running_sum

    rows = [(0, None), (1, None), (2, 5), (3, None), (4, 2), (5, None)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(5)
    got = {
        r["k"]: r["rs"] for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rs"] for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert got[0] is None and got[3] == 5 and got[5] == 7


def test_global_running_sum_decimal_values(spark):
    # the documented contract allows decimal value columns: offsets must
    # carry the sum type, not a hardcoded long
    from decimal import Decimal

    from pyspark.sql import Window, functions as F

    from as_etl_storage_spark.operators.rank import global_running_sum

    rows = [(i, Decimal(f"{i}.25")) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v decimal(10,2)").repartition(7)
    got = {
        r["k"]: r["rs"] for r in global_running_sum(df, ["k"], "v", "rs").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rs"] for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    keys=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.floats(allow_nan=True, allow_infinity=True, width=32),
            ),
            st.one_of(st.none(), st.text(max_size=6)),
        ),
        min_size=0,
        max_size=80,
    )
)
def test_global_rank_matches_row_number_on_hostile_keys(spark, keys):
    # boundary-literal bucketing must reproduce Spark's ASC NULLS FIRST /
    # NaN-greatest total order bit-for-bit on the key types where a
    # hand-rolled comparison most easily diverges: NULLs in any slot,
    # NaN / ±inf floats, duplicated keys, unicode strings — with a
    # unique id appended as the required tie-break
    from pyspark.sql import Window, functions as F

    from as_etl_storage_spark.operators.rank import global_rank

    rows = [(float(a) if a is not None else None, b, i)
            for i, (a, b) in enumerate(keys)]
    df = spark.createDataFrame(
        rows, "a double, b string, id long"
    ).repartition(5)
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank(df, ["a", "b", "id"]).collect()
    }
    w = Window.orderBy("a", "b", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_running_sum_total_col_in_plan(spark):
    # total_col attaches the exact corpus sum on every row, stays the
    # SUM type, and adds no single-partition exchange to the plan
    from decimal import Decimal

    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.rank import global_running_sum

    rows = [(i, Decimal(f"{i}.50")) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v decimal(10,2)").repartition(4)
    out = global_running_sum(df, ["k"], "v", "rs", total_col="tot")
    rows_out = out.collect()
    expect_total = sum(Decimal(f"{i}.50") for i in range(30))
    assert all(r["tot"] == expect_total for r in rows_out)
    assert dict(out.dtypes)["tot"].startswith("decimal")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_boundary_sampler_preserves_nan_null_and_large_longs(spark):
    # the Arrow sampler must not mangle boundary literals: pandas would
    # conflate NaN with NULL (flipping a greatest-key boundary to the
    # NULLS-FIRST bottom) and push nullable int64 through float64
    # (corrupting keys above 2^53)
    import math

    from as_etl_storage_spark.operators.rank import (
        _sample_boundaries,
        global_rank,
    )
    from pyspark.sql import Window, functions as F

    big = 2**60 + 12345
    rows = (
        [(float("nan"), None, i) for i in range(40)]
        + [(None, big + i, i + 40) for i in range(40)]
        + [(float(i), big * 2 + i, i + 80) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "a double, b long, id long").repartition(3)
    bounds = _sample_boundaries(df, ["a", "b", "id"], 8)
    assert bounds, "expected some boundaries"
    flat_a = [b[0] for b in bounds]
    flat_b = [b[1] for b in bounds if b[1] is not None]
    # NaN keys must survive as NaN (never collapse to None)
    assert any(v is not None and math.isnan(v) for v in flat_a) or all(
        v is not None for v in flat_a
    )
    # int64 keys must come back bit-exact (float64 would round to
    # multiples of 512 at this magnitude)
    assert all(v >= big and (v - big) < 3 * big for v in flat_b)
    exact = {r[1] for r in rows if r[1] is not None}
    assert set(flat_b) <= exact  # every boundary is a real sampled key
    # and the rank built on those boundaries is still bit-identical
    got = {r["id"]: r["global_rank"]
           for r in global_rank(df, ["a", "b", "id"]).collect()}
    want = {r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("a", "b", "id"))
            ).collect()}
    assert got == want


def test_bucket_search_tree_equals_linear_count(spark):
    # the binary-search CASE tree must place every key exactly where the
    # O(parts) sum-of-WHENs exceed-count did — including NULL slots in
    # keys AND boundaries, where _key_gt's three-valued fallthrough does
    # the NULLS-FIRST work
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.rank import (
        _bucket_search_expr,
        _key_gt,
    )

    cols = ["a", "b"]
    boundaries = [
        (None, 1),
        (0, None),
        (0, 5),
        (2, 2),
        (7, 0),
    ]
    vals = [None, 0, 1, 2, 3, 5, 6, 7, 8]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "a int, b int")
    linear = F.lit(0)
    for bnd in boundaries:
        linear = linear + F.when(_key_gt(cols, bnd), 1).otherwise(0)
    got = df.select(
        _bucket_search_expr(cols, boundaries).cast("int").alias("tree"),
        linear.cast("int").alias("lin"),
    ).collect()
    assert all(r["tree"] == r["lin"] for r in got)
    # degenerate shapes: no boundaries → bucket 0; one boundary → 0/1 split
    one = df.select(
        _bucket_search_expr(cols, []).cast("int").alias("t0"),
        _bucket_search_expr(cols, [(2, 2)]).cast("int").alias("t1"),
        (F.when(_key_gt(cols, (2, 2)), 1).otherwise(0)).alias("l1"),
    ).collect()
    assert all(r["t0"] == 0 and r["t1"] == r["l1"] for r in one)


def test_multilevel_bucket_chain_matches_linear_count(spark):
    # past _JIT_GROUP boundaries the bucket id switches to the chained
    # multi-level form (one codegen method per subtree, see
    # _attach_exceed_count); placement must stay bit-identical to the
    # O(parts) exceed-count — including NULL boundary slots, NULL keys,
    # and keys above/below/equal to every group-end boundary
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.rank import (
        _JIT_GROUP,
        _attach_exceed_count,
        _key_gt,
    )

    cols = ["a", "b"]
    # 3 groups' worth of strictly ascending boundaries with NULL slots
    n = 2 * _JIT_GROUP + 7
    boundaries = [(None, 3)] + [
        (i, None if i % 5 == 0 else i + 1) for i in range(n - 1)
    ]
    vals = [None, 0, 1, 2, 3, 7, 15, 31, 32, 33, 47, 62, 63, 64, 70, 99]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "a int, b int")
    linear = F.lit(0)
    for bnd in boundaries:
        linear = linear + F.when(_key_gt(cols, bnd), 1).otherwise(0)
    out = _attach_exceed_count(df, cols, boundaries, "chain").withColumn(
        "lin", linear.cast("int")
    )
    got = out.collect()
    assert all(r["chain"] == r["lin"] for r in got)
    # no helper columns leak
    assert set(out.columns) == {"a", "b", "chain", "lin"}


def test_multilevel_bucket_chain_stays_unfused(spark):
    # the chain only fixes the JIT cliff if Catalyst does NOT collapse it
    # back into one giant expression: every chain link must survive as
    # its own Project in the optimized plan (each gets its own codegen
    # consume method). A Spark upgrade that re-collapses the chain would
    # silently re-create the ~6x interpreted-bytecode constant.
    from as_etl_storage_spark.operators.rank import (
        _JIT_GROUP,
        _attach_exceed_count,
    )

    n = 3 * _JIT_GROUP  # 3 fine groups + 1 coarse level
    boundaries = [(i,) for i in range(n)]
    df = spark.createDataFrame([(i,) for i in range(5)], "a int")
    out = _attach_exceed_count(df, ["a"], boundaries, "pid")
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Project") >= 3
