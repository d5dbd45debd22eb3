"""Spec parsing/validation parity tests (SURVEY.md §5 item 1)."""

import pytest

from as_etl_storage_spark.spec import (
    JobSpec,
    ReaderSpec,
    SpecError,
    WriterSpec,
)


def _reader(**over):
    base = {
        "connection": {"url": "/tmp/x", "table": {"name": "lineitem"}},
        "column": ["l_orderkey"],
    }
    base.update(over)
    return base


def test_reader_minimal():
    r = ReaderSpec.from_json(_reader())
    assert r.connection.table.name == "lineitem"
    assert r.columns == ("l_orderkey",)


def test_empty_columns_rejected():
    # parity: empty select list is an error (reader/parameter.go:57-59)
    with pytest.raises(SpecError, match="column"):
        ReaderSpec.from_json(_reader(column=[]))


def test_query_sql_skips_column_requirement():
    r = ReaderSpec.from_json({"querySql": ["SELECT 1 AS x"]})
    assert r.query_sql == ("SELECT 1 AS x",)


def test_bad_split_range_type():
    with pytest.raises(SpecError, match="split.range.type"):
        ReaderSpec.from_json(_reader(split={"key": "k", "range": {"type": "float"}}))


def test_bad_time_accuracy():
    with pytest.raises(SpecError, match="timeAccuracy"):
        ReaderSpec.from_json(_reader(split={"key": "k", "timeAccuracy": "fortnight"}))


def _writer(**over):
    base = {
        "connection": {"url": "/tmp/x", "table": {"name": "out"}},
        "writeMode": "insert",
    }
    base.update(over)
    return base


def test_writer_defaults_match_reference():
    # batchSize=1000, batchTimeout=1s (writer/config.go:21-22)
    w = WriterSpec.from_json(_writer())
    assert w.batch_size == 1000
    assert w.batch_timeout_s == 1.0


def test_unknown_write_mode_rejected():
    # parity: unknown non-insert mode is an error (db.go:380-396)
    with pytest.raises(SpecError, match="writeMode"):
        WriterSpec.from_json(_writer(writeMode="upsertish"))


def test_replace_requires_merge_keys():
    with pytest.raises(SpecError, match="mergeKeys"):
        WriterSpec.from_json(_writer(writeMode="replace"))


def test_select_rejected_in_pre_post_sql():
    # parity: writer/config.go:167-175
    with pytest.raises(SpecError, match="preSQL"):
        WriterSpec.from_json(_writer(preSQL=["select * from t"]))
    with pytest.raises(SpecError, match="postSQL"):
        WriterSpec.from_json(_writer(postSQL=["  SELECT 1"]))


def test_job_roundtrip_json_string():
    job = JobSpec.from_json(
        '{"reader": {"connection": {"url": "/d", "table": {"name": "t"}}, '
        '"column": ["*"], "where": "a > 1"}}'
    )
    assert job.reader.where == "a > 1"
    assert job.writer is None


def test_reader_spec_trim_char_and_field_types():
    from as_etl_storage_spark.spec import ReaderSpec

    spec = ReaderSpec.from_json(
        {
            "dialect": "jdbc-oracle",
            "connection": {"url": "jdbc:oracle://db", "table": {"name": "t"}},
            "column": ["*"],
            "trimChar": True,
            "fieldTypes": {"name": "CHAR", "note": "VARCHAR2"},
        }
    )
    assert spec.trim_char is True
    assert spec.field_types == {"name": "CHAR", "note": "VARCHAR2"}
    # defaults: off / empty (reference BaseConfig.TrimChar zero value)
    d = ReaderSpec.from_json(
        {"connection": {"url": "/x", "table": {"name": "t"}}, "column": ["*"]}
    )
    assert d.trim_char is False and d.field_types == {}


class TestPruneTriplesFromWhere:
    """spec.prune_triples_from_where: the declarative surface of manifest
    data skipping. Extracted triples must always be IMPLIED by the full
    predicate (top-level AND conjuncts only) — a wrongly-extracted triple
    would prune files holding satisfying rows."""

    def p(self, s):
        from as_etl_storage_spark.spec import prune_triples_from_where

        return prune_triples_from_where(s)

    def test_simple_comparisons(self):
        assert self.p("k > 100") == [("k", ">", 100)]
        assert self.p("k >= 1 AND s = 'O'") == [
            ("k", ">=", 1),
            ("s", "=", "O"),
        ]
        assert self.p("100 <= k") == [("k", ">=", 100)]  # mirrored
        assert self.p("k == 3") == [("k", "=", 3)]  # Spark's == spelling
        assert self.p("x = -5") == [("x", "=", -5)]
        assert self.p("x = 1.5e2") == [("x", "=", 150.0)]
        assert self.p("`odd name` = 7") == [("odd name", "=", 7)]

    def test_null_in_between(self):
        assert self.p("x IS NULL") == [("x", "isnull", None)]
        assert self.p("x IS NOT NULL") == [("x", "notnull", None)]
        assert self.p("x IN (1, 2, 3)") == [("x", "in", [1, 2, 3])]
        assert self.p("x IN ('a', 'b''c')") == [("x", "in", ["a", "b'c"])]
        assert self.p("k BETWEEN 5 AND 10") == [
            ("k", ">=", 5),
            ("k", "<=", 10),
        ]
        # BETWEEN's AND must not split the conjunct — twice over
        assert self.p("a BETWEEN 1 AND 2 AND b BETWEEN 3 AND 4") == [
            ("a", ">=", 1),
            ("a", "<=", 2),
            ("b", ">=", 3),
            ("b", "<=", 4),
        ]

    def test_date_literal_and_bool(self):
        assert self.p("d >= DATE '2024-01-01'") == [
            ("d", ">=", "2024-01-01")
        ]
        assert self.p("x = true") == [("x", "=", True)]

    def test_complex_conjuncts_fall_through(self):
        # simple siblings survive, complex ones extract nothing
        assert self.p("(a = 1 OR b = 2) AND c < 9") == [("c", "<", 9)]
        assert self.p("upper(x) = 'A' AND c < 9") == [("c", "<", 9)]
        assert self.p("a = b AND c < 9") == [("c", "<", 9)]  # col-to-col
        assert self.p("a != 3 AND c < 9") == [("c", "<", 9)]  # ≠ unprunable

    def test_depth0_or_disables_everything(self):
        # AND binds tighter than OR: `a=1 OR b=2 AND c=3` is a
        # disjunction — NO triple is implied, extraction must yield none
        assert self.p("a = 1 OR b = 2 AND c = 3") == []
        assert self.p("a = 1 OR b = 2") == []

    def test_like_prefix(self):
        # constant prefix → half-open range [prefix, next-prefix)
        assert self.p("s LIKE 'abc%'") == [
            ("s", ">=", "abc"),
            ("s", "<", "abd"),
        ]
        # chars after the first wildcard still imply the prefix
        assert self.p("s LIKE 'ab_d'") == [
            ("s", ">=", "ab"),
            ("s", "<", "ac"),
        ]
        assert self.p("s LIKE 'a%b%c'") == [
            ("s", ">=", "a"),
            ("s", "<", "b"),
        ]
        # no wildcard at all → plain equality (incl. quote unescape)
        assert self.p("s LIKE 'it''s'") == [("s", "=", "it's")]
        # prefix ending at the max code point: lower bound only
        assert self.p("s LIKE 'a\U0010ffff%'") == [
            ("s", ">=", "a\U0010ffff")
        ]
        # leading wildcard: no prefix, nothing to extract
        assert self.p("s LIKE '%foo'") == []
        assert self.p("s LIKE '_oo'") == []
        # backslash anywhere: escape semantics differ per engine — off
        assert self.p("s LIKE 'ab\\%c%'") == []
        # NOT LIKE / ESCAPE clause fall through untouched
        assert self.p("s NOT LIKE 'abc%'") == []
        assert self.p("s LIKE 'a!%b%' ESCAPE '!'") == []
        # conjunct composition with a sibling triple
        assert self.p("s LIKE 'zz%' AND k < 9") == [
            ("s", ">=", "zz"),
            ("s", "<", "z{"),
            ("k", "<", 9),
        ]
        # prefix ending just below the surrogate block (r16, ADVICE
        # r15): the increment must SKIP lone surrogates — U+D7FF + 1
        # would be U+D800, which UTF-8/Py4J cannot encode; the bound
        # jumps to U+E000 (wider, still conservative), and every real
        # continuation (U+E000+) stays inside the range
        assert self.p("s LIKE 'a퟿%'") == [
            ("s", ">=", "a퟿"),
            ("s", "<", "a"),
        ]
        assert "a퟿zzz" < "a"  # a matchable string fits
        # ...and the bound round-trips through UTF-8 (the Py4J path)
        "a".encode("utf-8")

    def test_like_prefix_conservative_property(self):
        """For ANY pattern and ANY matching string, every derived triple
        must hold — a violated triple would prune a file containing a
        real match. Regex-reference LIKE matcher; hypothesis drives
        patterns over an alphabet including wildcards and quotes."""
        import re as _re

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from as_etl_storage_spark.spec import _like_prefix_triples

        def like_match(s: str, pattern: str) -> bool:
            rx = "".join(
                ".*" if c == "%" else "." if c == "_" else _re.escape(c)
                for c in pattern
            )
            return _re.fullmatch(rx, s, _re.DOTALL) is not None

        alphabet = "ab%_z09\U0010ffff퟿'"

        @settings(max_examples=300, deadline=None)
        @given(
            pattern=st.text(alphabet=alphabet, max_size=8),
            s=st.text(alphabet=alphabet, max_size=12),
        )
        def check(pattern: str, s: str) -> None:
            triples = _like_prefix_triples("c", pattern)
            if not like_match(s, pattern):
                return
            for _, op, val in triples:
                if op == "=":
                    assert s == val
                elif op == ">=":
                    assert s >= val
                elif op == "<":
                    assert s < val
                else:  # pragma: no cover - extractor emits only these
                    raise AssertionError(op)

        check()

    def test_unparseable_is_empty_never_raises(self):
        assert self.p("") == []
        assert self.p("t.a = 3") == []  # qualified name
        assert self.p("NOT a = 3") == []
        assert self.p("a in (select x from t)") == []
        assert self.p("a ~ 3 ;; %%") == []  # unlexable
        assert self.p("((a = 3)") == []  # unbalanced
