"""Operator robustness at the edges: null text, empty inputs, single rows.
The fixtures contain none of these; production corpora contain all of them."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from as_etl_storage_spark.operators import dedup, similarity, text
from as_etl_storage_spark.operators.graph import connected_components
from as_etl_storage_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def weird_docs(spark):
    return spark.createDataFrame(
        [
            (1, "normal document with several words here"),
            (2, None),
            (3, ""),
            (4, "x"),
            (5, "normal document with several words here"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )


class TestNullAndEmptyText:
    def test_exact_dedup_groups_nulls(self, spark, weird_docs):
        out = {r["doc_id"]: r["n_copies"] for r in
               dedup.exact_dedup(weird_docs, "doc_id", ["text"]).collect()}
        assert out[1] == 2      # 1 and 5 collapse
        assert out[2] == 1      # null forms its own group
        assert out[3] == 1

    def test_shingles_drop_null_keep_short(self, spark, weird_docs):
        sh = dedup.shingle_table(weird_docs, "doc_id", "text", 5).collect()
        docs = {r["doc"] for r in sh}
        assert 2 not in docs          # null text -> no shingles, no crash
        assert 4 in docs              # short text -> one truncated shingle
        assert 3 in docs              # empty text -> the '' shingle (two
        #                               empty docs are legitimately dups)

    def test_minhash_pipeline_survives_nulls(self, spark, weird_docs):
        pairs = dedup.minhash_dedup_pairs(weird_docs, "doc_id", "text").collect()
        found = {(r["doc_i"], r["doc_j"]) for r in pairs}
        assert (1, 5) in found        # the exact dup pair is found
        assert all(2 not in p for p in found)

    def test_simhash_survives_nulls(self, spark, weird_docs):
        pairs = dedup.simhash_dedup_pairs(weird_docs, "doc_id", "text", 3)
        got = {(r["doc_i"], r["doc_j"]) for r in pairs.collect()}
        assert (1, 5) in got          # identical docs: hamming 0

    def test_containment_is_asymmetric(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "abcdefghijklmnop"),                      # 16 chars
                (2, "abcdefghijklmnop" + "qrstuvwxyz" * 10),  # contains doc 1
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_i"], r["doc_j"]): r["containment"]
            for r in dedup.containment_pairs(
                docs, "doc_id", "text", n=8, p=4, q=5
            ).collect()
        }
        assert (1, 2) in out and out[(1, 2)] == 1.0  # doc 1 fully contained
        assert (2, 1) not in out  # big doc is NOT contained in the small one

    def test_containment_survives_nulls(self, spark, weird_docs):
        pairs = dedup.containment_pairs(weird_docs, "doc_id", "text").collect()
        found = {(r["doc_i"], r["doc_j"]) for r in pairs}
        assert (1, 5) in found and (5, 1) in found  # exact dups both ways
        assert all(2 not in p for p in found)

    def test_rarity_and_boilerplate_handle_nulls(self, spark, weird_docs):
        rows = text.rarity_score(weird_docs, "doc_id", "text").collect()
        assert {r["doc_id"] for r in rows} == {1, 4, 5}  # null/empty: no tokens
        docs = weird_docs.withColumn("source", F.lit("s"))
        bp = text.boilerplate_phrases(
            docs, "doc_id", "text", "source", n=3, min_docs=2
        ).collect()
        assert all(r["n_docs"] >= 2 for r in bp)
        assert any("normal document with" == r["gram"] for r in bp)  # 1 & 5

    def test_text_ops_handle_nulls(self, spark, weird_docs):
        # none of the text operators may throw on null/empty text
        for fn in (text.token_counts, text.fingerprint, text.lang_id, text.pii_flags):
            rows = fn(weird_docs, "doc_id", "text").collect()
            assert len(rows) == 5, fn.__name__

    def test_pack_sequences_boundary(self, spark):
        # 4 docs of 3 tokens each, budget 5: doc pack = floor(start/5)
        # starts are 0,3,6,9 -> packs 0,0,1,1; totals/conservation hold
        docs = spark.createDataFrame(
            [(i, "a b c", "s") for i in range(1, 5)] + [(9, None, "s")],
            "doc_id long, text string, source string",
        )
        rows = {r["pack_id"]: r for r in
                text.pack_sequences(docs, "doc_id", "text", "source", 5).collect()}
        assert set(rows) == {0, 1}
        assert rows[0]["n_docs"] == 2 and rows[0]["first_doc"] == 1
        assert rows[1]["n_docs"] == 2 and rows[1]["last_doc"] == 4
        assert sum(r["pack_tokens"] for r in rows.values()) == 12  # null dropped

    def test_bigram_counts_short_docs(self, spark):
        # single-token and null docs produce no bigrams (and no crash from
        # Spark's descending sequence(1, 0) trap); repeated bigrams count
        docs = spark.createDataFrame(
            [(1, "a b a b", "s"), (2, "solo", "s"), (3, None, "s"),
             (4, "a b", "s"), (5, "", "s")],
            "doc_id long, text string, source string",
        )
        rows = {r["bigram"]: r["n"] for r in
                text.bigram_counts(docs, "text", "source", min_count=2).collect()}
        assert rows == {"a b": 3}  # 2 from doc 1 + 1 from doc 4

    def test_inverted_index_bands_and_orders(self, spark):
        docs = spark.createDataFrame(
            [(3, "x common"), (1, "x common"), (2, "x rare"), (4, None)],
            "doc_id long, text string",
        )
        rows = {r["term"]: r for r in
                text.inverted_index(docs, "doc_id", "text",
                                    min_df=2, max_df=2).collect()}
        # 'x' has df=3 (> max), 'rare' df=1 (< min), 'common' df=2 stays
        assert set(rows) == {"common"}
        assert rows["common"]["postings"] == "1,3"  # ordered by doc_id


class TestEmptyInputs:
    def test_empty_edges_components(self, spark):
        edges = spark.createDataFrame([], "doc_i long, doc_j long")
        assert connected_components(edges).count() == 0

    def test_empty_corpus_topk(self, spark):
        emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
        out = similarity.cosine_topk(emb, "vec_id", "embedding", 3, "vid >= 0")
        assert out.count() == 0

    def test_asof_empty_right(self, spark):
        left = spark.createDataFrame([(1, 10)], "k long, t long")
        right = spark.createDataFrame([], "k long, rt long, p string")
        out = asof_join(left, right, "k", "t", "rt", ["p"]).collect()
        assert len(out) == 1 and out[0]["p"] is None

    def test_single_doc_no_pairs(self, spark):
        one = spark.createDataFrame([(1, "only document")], "doc_id long, text string")
        assert dedup.minhash_dedup_pairs(one, "doc_id", "text").count() == 0
        assert dedup.ngram_jaccard_pairs(one, "doc_id", "text").count() == 0


class TestNullEmbeddings:
    def test_cosine_pairs_with_null_vector(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        pairs = dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.9)
        got = {(r["vec_i"], r["vec_j"]) for r in pairs.collect()}
        assert got == {(1, 3)}  # null vector excluded, not crashing


class TestNewOperatorEdges:
    def test_keep_latest_one_row_per_key(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10, 100), (1, "a", 20, 101), (1, "b", 5, 102),
             (2, "a", 7, 103), (1, "a", 20, 104)],  # ts tie -> id 104 wins
            "k long, t string, ts long, id long",
        )
        out = dedup.keep_latest(df, ["k", "t"], ["ts", "id"])
        got = {(r.k, r.t): r.id for r in out.collect()}
        assert got == {(1, "a"): 104, (1, "b"): 102, (2, "a"): 103}
        # idempotent: compacting a compacted table is a no-op
        again = dedup.keep_latest(out, ["k", "t"], ["ts", "id"])
        assert sorted(r.id for r in again.collect()) == sorted(got.values())

    def test_vocabulary_null_and_empty(self, spark, weird_docs):
        out = text.vocabulary(weird_docs, "doc_id", "text", k=50).collect()
        terms = {r.t: (r.tf, r.df) for r in out}
        assert "" not in terms and None not in terms
        assert terms["normal"] == (2, 2)  # docs 1 and 5

    def test_top_terms_skips_null_docs(self, spark, weird_docs):
        out = text.top_terms(weird_docs, "doc_id", "text").collect()
        ids = {r.doc_id for r in out}
        assert 2 not in ids and 3 not in ids  # null/empty -> no terms
        assert {1, 4, 5} <= ids

    def test_incremental_empty_new_batch(self, spark, weird_docs):
        empty = weird_docs.where("doc_id < 0")
        out = dedup.incremental_dedup_pairs(empty, weird_docs, "doc_id", "text")
        assert out.count() == 0

    def test_incremental_finds_cross_dup_only(self, spark, weird_docs):
        new = spark.createDataFrame(
            [(10, "normal document with several words here"),
             (11, "totally different content nothing shared")],
            "doc_id long, text string",
        )
        out = dedup.incremental_dedup_pairs(new, weird_docs, "doc_id", "text")
        pairs = {(r.doc_i, r.doc_j) for r in out.collect()}
        assert pairs == {(10, 1), (10, 5)}


class TestSaltedJoin:
    def test_equals_plain_join_with_hot_key(self, spark):
        from as_etl_storage_spark.operators.skew import salted_join

        # 90% of big rows share one hot key
        big = spark.createDataFrame(
            [(1 if i % 10 else i, i) for i in range(1000)], "k long, v long"
        )
        small = spark.createDataFrame(
            [(1, "hot"), (20, "cold"), (30, "mild")], "k long, tag string"
        )
        got = salted_join(big, small, ["k"], n_salts=8)
        want = big.join(small, ["k"], "inner")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


class TestProductQuantization:
    def test_codes_in_range_and_deterministic(self, spark):
        import random

        random.seed(11)
        rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        enc = similarity.pq_encode(df, "vec_id", "embedding", dim=8, m=2, n_codes=4)
        got = {r["vid"]: (r["code0"], r["code1"]) for r in enc.collect()}
        assert len(got) == 40
        assert all(0 <= c < 4 for pair in got.values() for c in pair)
        # codebook vectors encode to themselves (distance 0 to own block)
        for cid in range(4):
            assert got[cid] == (cid, cid)
        again = {
            r["vid"]: (r["code0"], r["code1"])
            for r in similarity.pq_encode(
                df, "vec_id", "embedding", dim=8, m=2, n_codes=4
            ).collect()
        }
        assert again == got

    def test_pq_topk_excludes_self(self, spark):
        import random

        random.seed(12)
        rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = similarity.pq_topk(
            df, "vec_id", "embedding", dim=8, k=5, m=2, n_codes=4, n_queries=3
        ).collect()
        by_q = {}
        for r in out:
            assert r["neighbor_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == {0, 1, 2}
        assert all(sorted(v) == list(range(1, 6)) for v in by_q.values())


class TestRedaction:
    def test_redact_pii_order_and_nulls(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "mail bob1234@x.com or call 555-123-4567 ref 99999"),
                (2, "see https://a.b/c?id=123456 now"),
                (3, None),
                (4, "clean text"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in
                text.redact_pii(docs, "doc_id", "text").collect()}
        # email consumed BEFORE digit_runs could eat its digits; phone
        # before digit_runs; remaining long run becomes <NUM>
        assert rows[1]["clean_text"] == "mail <EMAIL> or call <PHONE> ref <NUM>"
        # the whole URL (digits included) collapses to one placeholder
        assert rows[2]["clean_text"] == "see <URL> now"
        assert rows[3]["clean_text"] is None and rows[3]["redacted"] is False
        assert rows[4]["clean_text"] == "clean text" and not rows[4]["redacted"]


class TestRound4Additions:
    def test_semantic_dedup_fewer_vectors_than_k(self, spark):
        # corpus smaller than the seed count: every vector is its own seed,
        # blocks are singletons unless vectors coincide — no crash, exact
        # duplicates still pair (identical vectors share a nearest seed)
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])],
            "vid long, v array<double>",
        )
        got = dedup.semantic_dedup_pairs(df, "vid", "v", k=8, threshold=0.9)
        assert {(r["vec_i"], r["vec_j"]) for r in got.collect()} == {(0, 2)}

    def test_ivf_nprobe_exceeds_centroids(self, spark):
        # nprobe > n_centroids degrades to probing every list: results must
        # equal the full brute-force ranking restricted to list membership
        df = spark.createDataFrame(
            [(i, [float(i % 4) + 1.0, float(i // 4) + 1.0]) for i in range(12)],
            "vid long, v array<double>",
        )
        wide = similarity.ivf_topk(df, "vid", "v", 2, n_centroids=4, nprobe=99)
        capped = similarity.ivf_topk(df, "vid", "v", 2, n_centroids=4, nprobe=4)
        assert sorted(map(tuple, wide.collect())) == sorted(
            map(tuple, capped.collect())
        )

    def test_oracle_normalize_empty_frame(self, spark):
        from as_etl_storage_spark.sources.jdbc import ORACLE

        df = spark.createDataFrame([], "a string, b int")
        out = ORACLE.normalize(df, {"a": "CHAR"})
        assert out.count() == 0 and out.columns == ["a", "b"]

    def test_jdbc_insert_sql_zero_columns_rejected(self, spark):
        from as_etl_storage_spark.spec import WriterSpec
        from as_etl_storage_spark.writers.jdbc import JdbcWriter

        spec = WriterSpec.from_json(
            {"connection": {"url": "jdbc:mysql://db", "table": {"name": "t"}}}
        )
        w = JdbcWriter(spark, spec, "mysql")
        # zero rows -> values-less statement is malformed; the renderer
        # must still emit a syntactically complete single-row template
        assert w.insert_sql(["a"], n_rows=1).endswith("values(?)")

    def test_cosine_ops_survive_zero_vectors(self, spark):
        # one zero vector in the corpus must not kill the job (ANSI
        # division); it simply can't be anyone's neighbor or pair
        df = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.0, 0.0]),  # corrupt row
                (2, [1.0, 0.001]),
                (3, [0.0, 1.0]),
            ],
            "vid long, v array<double>",
        )
        topk = similarity.cosine_topk(df, "vid", "v", 2, "vid >= 0").collect()
        assert all(r["neighbor_id"] != 1 and r["query_id"] != 1 for r in topk)
        pairs = dedup.embedding_cosine_pairs(df, "vid", "v", 0.9).collect()
        assert {(r["vec_i"], r["vec_j"]) for r in pairs} == {(0, 2)}
        sem = dedup.semantic_dedup_pairs(df, "vid", "v", k=2, threshold=0.9)
        assert {(r["vec_i"], r["vec_j"]) for r in sem.collect()} == {(0, 2)}


def test_ann_query_side_cap_guards_driver(spark):
    # brute-force ANN collects/broadcasts the query side; a predicate
    # matching a corpus-sized set must fail fast with an actionable error
    # instead of OOMing the driver
    import pytest

    from as_etl_storage_spark.operators import similarity
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk(
            emb, "vec_id", "embedding", 3, "vid >= 0", max_queries=5
        )
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk_vectorized(
            emb, "vec_id", "embedding", 3, "vid >= 0", max_queries=5
        )
    with pytest.raises(ValueError, match="max_queries"):
        similarity.int8_topk_rescore(
            emb, "vec_id", "embedding", 3, "vid >= 0", max_queries=5
        )
    # query-sized predicates pass through unchanged
    got = similarity.cosine_topk(
        emb, "vec_id", "embedding", 3, "vid < 3", max_queries=5
    )
    assert got.count() > 0


def test_quality_score_survives_degenerate_documents(spark):
    # ANSI mode is the session default, so the empty document every real
    # corpus contains must score NULL ratios — not kill the job with
    # DIVIDE_BY_ZERO on n_chars
    from as_etl_storage_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "hello world."), (2, ""), (3, None), (4, "   ")],
        "id long, txt string",
    )
    rows = {r["id"]: r for r in text_ops.quality_score(df, "id", "txt").collect()}
    assert rows[1]["punct_ratio"] is not None
    assert rows[2]["punct_ratio"] is None  # 0 chars -> NULL, not a crash
    assert rows[3]["n_tokens"] is None     # NULL text propagates NULL
    assert rows[4]["punct_ratio"] == 0.0   # whitespace-only: 0 punct / 3 chars


def test_connected_components_raises_on_non_convergence(spark):
    # min-label propagation moves one hop per round: a chain longer than
    # max_iter must FAIL FAST, not silently return multiple labels for
    # one component (which a keep-one dedup stage would then act on)
    import pytest

    from as_etl_storage_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_i long, doc_j long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(chain, max_iter=15).collect()
    }
    assert set(got.values()) == {0}  # one component, min-id label


def test_sample_to_rates_rejects_wrong_arity_keys(spark):
    # a rate key of the wrong arity would compare a group column against
    # NULL — never matching — and silently sample at the default rate
    import pytest

    from as_etl_storage_spark.operators.sampling import sample_to_rates

    df = spark.createDataFrame(
        [(1, "s1", "en"), (2, "s2", "de")], "id long, src string, lang string"
    )
    with pytest.raises(ValueError, match="arity"):
        sample_to_rates(df, "id", ["src", "lang"], {"s1": 0.5})
    ok = sample_to_rates(df, "id", ["src", "lang"], {("s1", "en"): 1.0})
    assert ok.count() >= 1


def test_asof_join_deterministic_on_tied_right_timestamps(spark):
    # two right rows at the SAME (key, time): the carried payload must be
    # a deterministic pick (greatest payload tuple), not shuffle order
    from as_etl_storage_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b")], "k long, t long, p string"
    )
    picks = set()
    for n in (1, 7):
        got = asof_join(
            left, right.repartition(n), "k", "t", "t", ["p"]
        ).collect()
        assert len(got) == 1
        picks.add(got[0]["p"])
    assert picks == {"b"}  # greatest payload tuple, every partitioning


def test_ann_query_cap_fallback_for_prepared_columns(spark):
    # a predicate referencing a PREPARED column (norm) cannot resolve on
    # the cheap id-only projection; the guard must fall back to the
    # prepared frame and both enforce the cap and pass small sets through
    import pytest

    from as_etl_storage_spark.operators import similarity
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk(
            emb, "vec_id", "embedding", 3, "norm > 0", max_queries=5
        )
    got = similarity.cosine_topk(
        emb, "vec_id", "embedding", 3, "norm > 0 AND vid < 3", max_queries=5
    )
    assert got.count() > 0


def test_asof_join_map_payload_skips_tie_break_not_crashes(spark):
    # MapType is unorderable: it must be EXCLUDED from the tie-break sort
    # (previously joining payloads into ORDER BY made this raise), while
    # orderable payload columns keep their deterministic tied-row pick
    from as_etl_storage_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, "a", {"x": 1}), (1, 5, "b", {"x": 2})],
        "k long, t long, p string, m map<string,long>",
    )
    got = asof_join(left, right, "k", "t", "t", ["p", "m"]).collect()
    assert len(got) == 1
    assert got[0]["p"] == "b"  # orderable column still deterministic
    # map payload is carried; only presence is asserted — the per-column
    # carry caveat means tied rows may mix for non-tie-break columns
    assert got[0]["m"] is not None


def test_connected_components_max_iter_edges(spark):
    # max_iter=0 would return identity labels with convergence never
    # observed (the exact silent-wrong-result the guard exists for);
    # diameter == max_iter converges ON the final round — the
    # verification pass must accept it instead of false-positive raising
    import pytest

    from as_etl_storage_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_i long, doc_j long"
    )
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(chain, max_iter=0)
    # label 0 moves one hop per round: vertex 12 is reached exactly on
    # round 12, so the loop exits with changed != 0 yet labels are final
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(chain, max_iter=12).collect()
    }
    assert set(got.values()) == {0}
