"""Split-computation parity + property tests (SURVEY.md §5 item 4):
ranges partition [min,max] exactly — no overlap, no gap, remainder balance
<= 1 (doSplit arithmetic, split.go:361-391)."""

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from as_etl_storage_spark.plans.split import (
    BigIntConvertor,
    SplitError,
    StringConvertor,
    TimeConvertor,
    do_split,
    range_predicates,
    split_ranges,
)


class TestDoSplit:
    def test_even(self):
        assert do_split(0, 10, 2) == [(0, 5), (5, 10)]

    def test_remainder_goes_to_leading_ranges(self):
        # gap=10, num=3 -> widths 4,3,3
        assert do_split(0, 10, 3) == [(0, 4), (4, 7), (7, 10)]

    def test_single(self):
        assert do_split(5, 5, 4) == [(5, 5)]
        assert do_split(0, 100, 1) == [(0, 100)]

    def test_num_capped_at_gap(self):
        assert do_split(0, 2, 10) == [(0, 1), (1, 2)]

    def test_errors(self):
        with pytest.raises(SplitError):
            do_split(0, 10, 0)
        with pytest.raises(SplitError):
            do_split(10, 0, 2)

    @given(
        left=st.integers(-(10**30), 10**30),
        gap=st.integers(0, 10**30),
        num=st.integers(1, 1000),
    )
    @settings(max_examples=300)
    def test_partition_invariants(self, left, gap, num):
        right = left + gap
        ranges = do_split(left, right, num)
        # contiguous cover of [left, right]
        assert ranges[0][0] == left
        assert ranges[-1][1] == right
        for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
            assert hi_a == lo_b
        # near-equal widths (remainder balance <= 1)
        widths = [hi - lo for lo, hi in ranges]
        assert max(widths) - min(widths) <= 1


class TestStringConvertor:
    """radix-128 codec parity (split.go:244-287)."""

    conv = StringConvertor()

    def test_roundtrip(self):
        for s in ["", "a", "Customer#000000042", "zzz", "\x01\x7f"]:
            assert self.conv.from_int(self.conv.to_int(s)) == s

    def test_non_ascii_rejected(self):
        with pytest.raises(SplitError):
            self.conv.to_int("héllo")

    @given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=20))
    @settings(max_examples=200)
    def test_roundtrip_property(self, s):
        assert self.conv.from_int(self.conv.to_int(s)) == s

    @given(
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), min_size=3, max_size=3),
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), min_size=3, max_size=3),
    )
    @settings(max_examples=200)
    def test_equal_length_order_preserved(self, a, b):
        # radix-128 encoding is order-isomorphic for equal-length strings
        assert (a < b) == (self.conv.to_int(a) < self.conv.to_int(b))

    @given(
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), min_size=1, max_size=5),
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), min_size=1, max_size=5),
    )
    @settings(max_examples=300)
    def test_fitted_order_preserved_mixed_length(self, a, b):
        # after fit(), encoding is order-isomorphic even across lengths
        conv = StringConvertor()
        conv.fit(min(a, b, key=len), max(a, b, key=len))
        assert (a < b) == (conv.to_int(a) < conv.to_int(b))

    def test_fitted_rejects_nul(self):
        conv = StringConvertor(width=3)
        with pytest.raises(SplitError):
            conv.to_int("a\x00b")


class TestMixedLengthStringSplit:
    """Regression for the reference's radix-order flaw: mixed-length key
    domains must still yield non-overlapping, gap-free lexicographic
    ranges (the naive variable-length encoding makes 'b' < 'aa'
    numerically while 'aa' < 'b' lexicographically)."""

    @staticmethod
    def _matches(key, ranges):
        return sum(
            (key >= lo) and (key <= hi if closed else key < hi)
            for lo, hi, closed in ranges
        )

    def test_advisor_repro(self):
        ranges = split_ranges("a", "yz", 600, StringConvertor())
        assert ranges[0][0] == "a" and ranges[-1][1] == "yz"
        for key in ("q5", "b", "aa", "a", "yz", "m", "mmmm"):
            assert self._matches(key, ranges) == 1, key

    @given(
        st.lists(
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=6),
            min_size=2,
            max_size=30,
            unique=True,
        ),
        st.integers(min_value=2, max_value=12),
    )
    @settings(max_examples=150)
    def test_every_key_in_exactly_one_range(self, keys, num):
        lo, hi = min(keys), max(keys)
        ranges = split_ranges(lo, hi, num, StringConvertor())
        # boundaries lex-sorted, contiguous, anchored at the domain bounds
        assert ranges[0][0] == lo and ranges[-1][1] == hi
        for (a, b, _), (c, d, _) in zip(ranges, ranges[1:]):
            assert a <= b and b == c
        for key in keys:
            assert self._matches(key, ranges) == 1, key


class TestTimeConvertor:
    def test_day_accuracy(self):
        c = TimeConvertor("day")
        t = datetime(2024, 3, 1, tzinfo=timezone.utc)
        assert c.from_int(c.to_int(t)) == t

    def test_units_ordering(self):
        base = datetime(2024, 3, 1, 12, 30, 15, 123456, tzinfo=timezone.utc)
        for acc in ("day", "min", "s", "ms", "us", "ns"):
            c = TimeConvertor(acc)
            n = c.to_int(base)
            later = c.to_int(datetime(2025, 1, 1, tzinfo=timezone.utc))
            assert later > n

    def test_bad_accuracy(self):
        with pytest.raises(SplitError):
            TimeConvertor("weeks")


class TestRangePredicates:
    def test_bigint_predicates(self):
        preds = range_predicates("k", 0, 10, 2, BigIntConvertor())
        assert preds == [
            "k >= 0 AND k < 5",
            "k >= 5 AND k <= 10",
        ]

    def test_last_range_closed(self):
        # parity: last range uses <= (reader/job.go:184-187)
        preds = range_predicates("k", 0, 100, 4, BigIntConvertor())
        assert all("<" in p for p in preds)
        assert preds[-1].endswith("<= 100")
        assert all(not p.endswith("< 100") for p in preds[:-1])

    def test_string_predicates_quote(self):
        preds = range_predicates("name", "a", "d", 3, StringConvertor())
        assert all("name >= '" in p for p in preds)

    def test_ranges_cover_domain(self):
        ranges = split_ranges(100, 1000, 7, BigIntConvertor())
        assert ranges[0][0] == 100
        assert ranges[-1][1] == 1000
        assert ranges[-1][2] is True
        assert all(not closed for _, _, closed in ranges[:-1])


def test_time_last_bound_keeps_sub_accuracy_rows(spark):
    """Day-accuracy split over a max with an afternoon component: the last
    CLOSED predicate must use the exact max, not floor(max) — otherwise
    every row in (floor(max), max] silently vanishes from the scan."""
    from datetime import datetime

    from as_etl_storage_spark.plans.split import TimeConvertor, range_predicates

    lo = datetime(2026, 1, 1, 0, 0)
    hi = datetime(2026, 1, 3, 13, 45)
    preds = range_predicates("ts", lo, hi, 2, TimeConvertor("day"))
    assert "13:45" in preds[-1]  # exact max, not the floored boundary
    df = spark.createDataFrame(
        [(datetime(2026, 1, 1, 0, 0),), (datetime(2026, 1, 3, 13, 45),)],
        "ts timestamp",
    )
    got = sum(df.where(p).count() for p in preds)
    assert got == 2  # no gap, no overlap, afternoon row included


def test_string_backslash_literal_escaping(spark):
    """Backslash-bearing keys: Spark's parser treats backslash as an
    escape, so the literal must double it — and the rendered predicates
    must actually tile backslash keys on a live frame."""
    from as_etl_storage_spark.plans.split import StringConvertor, range_predicates

    keys = ["C:\\alpha", "C:\\zeta", "plain"]
    conv = StringConvertor()
    conv.fit(min(keys), max(keys))
    preds = range_predicates("k", min(keys), max(keys), 3, conv)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    assert sum(df.where(p).count() for p in preds) == len(keys)
    # standard-SQL dialects (Derby/Oracle) render the raw backslash
    raw = StringConvertor(backslash_escapes=False)
    assert raw.literal("C:\\x") == "'C:\\x'"


def test_date_split_key_supported(spark, tmp_path):
    """A DateType split key (TYPE_TIME) must split, not crash on
    .tzinfo: dates promote to midnight and the ranges tile the table."""
    from as_etl_storage_spark.plans.planner import plan_split_union
    from as_etl_storage_spark.spec import ReaderSpec

    df = spark.sql(
        "SELECT sequence(DATE '2026-01-01', DATE '2026-03-11') AS ds"
    ).selectExpr("explode(ds) AS d", "1 AS v")
    p = str(tmp_path)
    df.write.parquet(p + "/dates.parquet")
    reader = ReaderSpec.from_json({
        "connection": {"url": p, "table": {"name": "dates"}},
        "column": ["*"],
        "split": {"key": "d", "range": {"type": "time"}},
    })
    out = plan_split_union(spark, reader, 4)
    assert out.count() == df.count()
    assert out.select("d").distinct().count() == df.count()


def test_declared_time_bounds_with_go_layout(spark, tmp_path):
    """split.range.layout governs bound parsing (split.go:47-61):
    a 2006/01/02-layout spec must parse and tile."""
    from datetime import datetime

    from as_etl_storage_spark.plans.planner import plan_split_union
    from as_etl_storage_spark.spec import ReaderSpec

    rows = [(datetime(2026, 1, 2, 8, 0), i) for i in range(10)] + [
        (datetime(2026, 2, 27, 23, 59), 99)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    p = str(tmp_path)
    df.write.parquet(p + "/evts.parquet")
    reader = ReaderSpec.from_json({
        "connection": {"url": p, "table": {"name": "evts"}},
        "column": ["*"],
        "split": {
            "key": "ts",
            "range": {
                "type": "time",
                "layout": "2006/01/02",
                "left": "2026/01/02",
                "right": "2026/03/01",
            },
        },
    })
    out = plan_split_union(spark, reader, 3)
    assert out.count() == len(rows)


def test_half_declared_bounds_rejected():
    """Declaring only one of left/right is a SpecError, not a silent
    fallback to full min/max discovery; JSON null means undeclared."""
    import pytest

    from as_etl_storage_spark.spec import ReaderSpec, SpecError, SplitSpec

    with pytest.raises(SpecError, match="only one of left/right"):
        ReaderSpec.from_json({
            "connection": {"url": "/x", "table": {"name": "t"}},
            "column": ["*"],
            "split": {"key": "k", "range": {"type": "bigint", "left": "5"}},
        }).validate()
    s = SplitSpec.from_json(
        {"key": "k", "range": {"type": "bigint", "left": None, "right": None}}
    )
    assert s.range.left == "" and s.range.right == ""


def test_dedupe_generated_name_collision():
    """['a','a','a1'] must not rename the duplicate to the real column
    'a1' — generated names are collision-checked."""
    from as_etl_storage_spark.types import dedupe_column_names

    out = dedupe_column_names(["a", "a", "a1"])
    assert out[0] == "a" and len(set(out)) == 3
    assert out[2] == "a1"  # the real column keeps its name


def test_engine_write_validates_spec(spark, tmp_path):
    """Engine.write enforces the same spec invariants as the JSON job
    path: unknown mode and SELECT hooks fail before any side effects."""
    import pytest

    from as_etl_storage_spark.engine import Engine
    from as_etl_storage_spark.spec import SpecError

    eng = Engine(spark)
    df = spark.range(3).selectExpr("id AS k")
    with pytest.raises(SpecError, match="writeMode"):
        eng.write(df, str(tmp_path), "t1", mode="append")
    with pytest.raises(SpecError, match="SELECT"):
        eng.write(df, str(tmp_path), "t2", pre_sql=("SELECT 1",))
    # derby now dispatches through the shared factory
    import uuid

    url = f"jdbc:derby:memory:eng_{uuid.uuid4().hex[:8]};create=true"
    res = eng.write(df, url, "t_eng", dialect="derby")
    # JDBC write result reports -1 (the database owns the count); verify
    # the rows round-trip instead
    assert res.written == -1
    back = spark.read.format("jdbc").option("url", url).option(
        "dbtable", '"t_eng"'
    ).option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
    assert back.count() == 3


def test_time_literals_convert_aware_bounds_to_utc():
    # an S13 bound declared with a non-UTC ISO offset must render as its
    # UTC instant: strftime drops tzinfo, and the literal is interpreted
    # as session-UTC — the offset would silently shift the bound
    from datetime import datetime

    from as_etl_storage_spark.plans.split import TimeConvertor

    c = TimeConvertor("day")
    aware = datetime.fromisoformat("2024-03-01T02:00:00+05:00")
    # 02:00+05:00 == 2024-02-29T21:00 UTC — the DATE changes
    assert c.literal_exact(aware) == "TIMESTAMP '2024-02-29 21:00:00.000000'"
    assert "2024-02-29" in c.literal(aware)
    # naive values pass through unchanged (already session-UTC)
    naive = datetime(2024, 3, 1, 2, 0, 0)
    assert c.literal_exact(naive) == "TIMESTAMP '2024-03-01 02:00:00.000000'"
