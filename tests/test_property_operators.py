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
