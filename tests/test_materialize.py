"""Incremental materialized views (r17): a declarative materialize job
keeps a row-level transform of a row-tracked source continuously true
by consuming change_feed(with_row_ids=True) and applying the NET delta
with id-keyed merges. Contract: the view always equals the from-scratch
transform, refreshes cost ∝ changes (no-op source activity touches zero
view data files), non-CDF ranges and changed definitions rebuild, and
non-row-level definitions are refused up front."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from as_etl_storage_spark.runner import run_job
from as_etl_storage_spark.spec import JobSpec, SpecError
from as_etl_storage_spark.writers.versioned import VersionedTable


def _source(spark, root, n=20):
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    src.enable_row_tracking()
    return src


def _job(root, **overrides):
    return {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "select": ["k", "v * 2 AS v2"],
            "where": "v >= 50",
            **overrides,
        }
    }


def _expect(src):
    """The from-scratch transform the view must always equal."""
    return {
        (r.k, r.v * 2) for r in src.read().where("v >= 50").collect()
    }


def _got(spark, root):
    view = VersionedTable(spark, os.path.join(root, "view"))
    return {(r.k, r.v2) for r in view.read().select("k", "v2").collect()}


def test_initial_build_records_state(spark, tmp_path):
    root = str(tmp_path)
    src = _source(spark, root)
    res = run_job(spark, _job(root))
    assert res.mode == "initial"
    assert res.source_version == src.latest_version()
    view = VersionedTable(spark, res.view_path)
    assert set(view.read().columns) == {"k", "v2", "_src_row_id"}
    props = view._properties_at(view.latest_version())
    assert props["vt.mv.source"] == os.path.join(root, "src")
    assert int(props["vt.mv.sourceVersion"]) == src.latest_version()
    assert props["vt.mv.fingerprint"]
    assert _got(spark, root) == _expect(src)


def test_incremental_apply_across_full_dml_cycle(spark, tmp_path):
    """append + delete + update (crossing the filter boundary BOTH
    ways) + merge, netted and applied by id — the view matches the
    from-scratch transform after one incremental refresh."""
    root = str(tmp_path)
    src = _source(spark, root)
    run_job(spark, _job(root))
    src.append(
        spark.range(20, 25).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    src.delete("k = 7")  # in-view row leaves
    src.update("k = 8", {"v": "999"})  # stays in the filter, new value
    src.update("k = 9", {"v": "1"})  # falls OUT of the filter
    src.update("k = 2", {"v": "77"})  # was OUT, comes IN
    src.merge(  # upsert: one update, one brand-new row
        spark.createDataFrame([(5, 500), (100, 1000)], "k long, v long"),
        on=["k"],
    )
    res = run_job(spark, _job(root))
    assert res.mode == "incremental"
    assert res.deletes and res.upserts
    assert _got(spark, root) == _expect(src)


def test_multi_update_nets_to_one_terminal_event(spark, tmp_path):
    """A row updated repeatedly and finally deleted across the range
    applies as ONE delete; a row updated repeatedly applies its LAST
    image only."""
    root = str(tmp_path)
    src = _source(spark, root)
    run_job(spark, _job(root))
    for val in ("111", "222", "333"):
        src.update("k = 6", {"v": val})
    src.delete("k = 6")
    for val in ("444", "555"):
        src.update("k = 11", {"v": val})
    res = run_job(spark, _job(root))
    assert res.mode == "incremental"
    got = _got(spark, root)
    assert got == _expect(src)
    assert (11, 1110) in got and all(k != 6 for k, _ in got)


def test_noop_and_bookmark_touch_no_data_files(spark, tmp_path):
    """Source unchanged → zero view commits; layout-only source
    activity (compact / checkpoint) → one metadata commit moving the
    bookmark, the view's DATA files byte-identical."""
    root = str(tmp_path)
    src = _source(spark, root)
    run_job(spark, _job(root))
    view = VersionedTable(spark, os.path.join(root, "view"))
    v_before = view.latest_version()
    res = run_job(spark, _job(root))
    assert res.mode == "noop" and view.latest_version() == v_before
    # fragment the source so the compact really commits, and refresh
    # past the appends first — the remaining range is layout-only
    for lo in (100, 110):
        src.append(
            spark.range(lo, lo + 5).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ).coalesce(1)
        )
    run_job(spark, _job(root))
    files_before = set(view._state(view.latest_version()))
    assert src.compact(target_file_bytes=1 << 30) == src.latest_version()
    res = run_job(spark, _job(root))
    assert res.mode == "bookmark"
    assert set(view._state(view.latest_version())) == files_before
    m = view._manifest(view.latest_version())
    assert m["op"] == "set_properties"
    assert int(
        view._properties_at(view.latest_version())["vt.mv.sourceVersion"]
    ) == src.latest_version()


def test_non_cdf_range_and_changed_definition_rebuild(spark, tmp_path):
    root = str(tmp_path)
    src = _source(spark, root)
    run_job(spark, _job(root))
    # overwrite records no change files: the CDF contract says full
    # re-read — the refresh rebuilds and still matches
    src.overwrite(
        spark.range(40).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
    )
    res = run_job(spark, _job(root))
    assert res.mode == "full"
    assert _got(spark, root) == _expect(src)
    # a changed definition (different where) must not apply new
    # transforms to old rows: fingerprint mismatch → rebuild
    res = run_job(spark, _job(root, where="v >= 100"))
    assert res.mode == "full"
    got = _got(spark, root)
    assert got == {
        (r.k, r.v * 2) for r in src.read().where("v >= 100").collect()
    }
    # forced rebuild flag
    res = run_job(spark, _job(root, where="v >= 100", fullRefresh=True))
    assert res.mode == "full"


def test_refresh_is_idempotent_replay(spark, tmp_path):
    """Crash-safety contract: re-applying the same feed range (bookmark
    rolled back by hand, as after a crash between the data merges and
    the bookmark commit) converges to the same view."""
    root = str(tmp_path)
    src = _source(spark, root)
    run_job(spark, _job(root))
    view = VersionedTable(spark, os.path.join(root, "view"))
    last = view._properties_at(view.latest_version())["vt.mv.sourceVersion"]
    src.delete("k = 12")
    src.update("k = 13", {"v": "888"})
    run_job(spark, _job(root))
    want = _got(spark, root)
    # roll the bookmark back: the next refresh replays the same range
    view.set_properties({"vt.mv.sourceVersion": last})
    res = run_job(spark, _job(root))
    assert res.mode == "incremental"
    assert _got(spark, root) == want == _expect(src)


def test_requires_row_tracking_and_versioned_source(spark, tmp_path):
    root = str(tmp_path)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
    )
    with pytest.raises(SpecError, match="enable_row_tracking"):
        run_job(spark, _job(root))
    with pytest.raises(SpecError, match="versioned"):
        run_job(
            spark,
            {
                "materialize": {
                    "connection": {
                        "url": root,
                        "table": {"name": "nosuch"},
                    },
                    "target": os.path.join(root, "view"),
                }
            },
        )


def test_refuses_non_row_level_definitions(spark, tmp_path):
    root = str(tmp_path)
    _source(spark, root)
    with pytest.raises(SpecError, match="row-level"):
        run_job(spark, _job(root, select=["sum(v) AS s"]))
    with pytest.raises(SpecError, match="deterministic"):
        run_job(spark, _job(root, select=["k", "rand() AS r"]))
    with pytest.raises(SpecError, match="analyze"):
        run_job(spark, _job(root, select=["no_such_column"]))


def test_default_select_carries_all_columns(spark, tmp_path):
    root = str(tmp_path)
    src = _source(spark, root)
    res = run_job(spark, _job(root, select=[], where=""))
    view = VersionedTable(spark, res.view_path)
    assert set(view.read().columns) == {"k", "v", "_src_row_id"}
    src.update("k = 3", {"v": "42"})
    res = run_job(spark, _job(root, select=[], where=""))
    assert res.mode == "incremental"
    got = {(r.k, r.v) for r in view.read().select("k", "v").collect()}
    assert got == {(r.k, r.v) for r in src.read().collect()}


def test_spec_validation(spark, tmp_path):
    with pytest.raises(SpecError, match="stands alone"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": "/x", "table": {"name": "t"}},
                    "target": "/y",
                },
                "reader": {"connection": {"url": "/z"}},
            }
        )
    with pytest.raises(SpecError, match="target"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": "/x", "table": {"name": "t"}}
                }
            }
        )
    with pytest.raises(SpecError, match="non-empty"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": "/x", "table": {"name": "t"}},
                    "target": "/y",
                    "select": ["k", "  "],
                }
            }
        )


# ----------------------------------------------------- aggregate views --
def _agg_job(root, **overrides):
    return {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "groupBy": ["g"],
            "aggregates": {
                "n": "count(*)",
                "s": "sum(CAST(v AS DECIMAL(18,2)))",
            },
            "where": "v >= 50",
            **overrides,
        }
    }


def _grouped_source(spark, root, n=30, tracked=False):
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 10).alias("v"),
        )
    )
    if tracked:
        src.enable_row_tracking()
    return src


def _agg_expect(src):
    return {
        (r.g, r.n, None if r.s is None else float(r.s))
        for r in src.read()
        .where("v >= 50")
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }


def _agg_got(spark, root):
    view = VersionedTable(spark, os.path.join(root, "view"))
    return {
        (r.g, r.n, None if r.s is None else float(r.s))
        for r in view.read().select("g", "n", "s").collect()
    }


def test_aggregate_view_full_dml_cycle_without_row_tracking(
    spark, tmp_path
):
    """count/sum groupBy views maintain by ±delta from the CDF alone —
    NO row tracking on the source — through append, delete, a
    filter-crossing update and a merge; folding matches a from-scratch
    aggregation after one incremental refresh."""
    root = str(tmp_path)
    src = _grouped_source(spark, root, tracked=False)
    res = run_job(spark, _agg_job(root))
    assert res.mode == "initial"
    assert _agg_got(spark, root) == _agg_expect(src)
    src.append(
        spark.range(30, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 10).alias("v"),
        )
    )
    src.delete("k % 4 = 1")
    src.update("k % 5 = 0", {"v": "v + 7"})
    src.update("k = 8", {"v": "1"})  # leaves the filter: -delta only
    src.merge(  # new group '7' is born via insert
        spark.createDataFrame(
            [(12, "7", 700), (100, "7", 60)], "k long, g string, v long"
        ),
        on=["k"],
    )
    res = run_job(spark, _agg_job(root))
    assert res.mode == "incremental" and res.upserts
    assert _agg_got(spark, root) == _agg_expect(src)
    # group death: all of '7' leaves the filtered source -> the view
    # row is swept, not left as a zero-count husk
    src.delete("g = '7'")
    run_job(spark, _agg_job(root))
    assert _agg_got(spark, root) == _agg_expect(src)
    view = VersionedTable(spark, os.path.join(root, "view"))
    assert view.read().where("g = '7'").count() == 0
    # rebirth: the group comes back as a fresh insert
    src.append(
        spark.createDataFrame([(200, "7", 90)], "k long, g string, v long")
    )
    run_job(spark, _agg_job(root))
    assert _agg_got(spark, root) == _agg_expect(src)
    assert run_job(spark, _agg_job(root)).mode == "noop"


def test_aggregate_null_sums_fold_null_safely(spark, tmp_path):
    """An all-NULL group's sum stays SQL-NULL (not zero), and a NULL
    delta never wipes an accumulated sum."""
    root = str(tmp_path)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.createDataFrame(
            [(1, "a", 100), (2, "a", None), (3, "b", None)],
            "k long, g string, v long",
        )
    )
    job = _agg_job(root, where="")
    run_job(spark, job)
    got = _agg_got_where_any(spark, root)
    assert got == {("a", 2, 100.0), ("b", 1, None)}
    # a NULL-valued insert into 'a' must not wipe its sum; a real value
    # landing in 'b' must start from NULL, not 0
    src.append(
        spark.createDataFrame(
            [(4, "a", None), (5, "b", 50)], "k long, g string, v long"
        )
    )
    res = run_job(spark, job)
    assert res.mode == "incremental"
    assert _agg_got_where_any(spark, root) == {
        ("a", 3, 100.0),
        ("b", 2, 50.0),
    }
    # deleting the only valued row of 'b' leaves count 1, sum 0 (the
    # abelian fold cannot know the rest are NULL without a re-scan:
    # 0 is the sum's additive identity, documented as such)
    src.delete("k = 5")
    run_job(spark, job)
    got = _agg_got_where_any(spark, root)
    assert ("a", 3, 100.0) in got


def _agg_got_where_any(spark, root):
    view = VersionedTable(spark, os.path.join(root, "view"))
    return {
        (r.g, r.n, None if r.s is None else float(r.s))
        for r in view.read().select("g", "n", "s").collect()
    }


def test_aggregate_refuses_unmaintainable_and_bad_specs(spark, tmp_path):
    root = str(tmp_path)
    _grouped_source(spark, root)
    with pytest.raises(SpecError, match="DISTINCT"):
        run_job(
            spark, _agg_job(root, aggregates={"d": "count(DISTINCT v)"})
        )
    with pytest.raises(SpecError, match="grammar"):
        run_job(
            spark, _agg_job(root, aggregates={"p": "percentile(v, 0.5)"})
        )
    with pytest.raises(SpecError, match="collide"):
        run_job(
            spark,
            _agg_job(
                root,
                aggregates={"m": "avg(v)", "m__cnt": "count(*)"},
            ),
        )
    with pytest.raises(SpecError, match="deterministic"):
        run_job(spark, _agg_job(root, aggregates={"s": "sum(v * rand())"}))
    with pytest.raises(SpecError, match="analyze"):
        run_job(spark, _agg_job(root, aggregates={"s": "sum(no_such)"}))
    with pytest.raises(SpecError, match="come together"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "src"}},
                    "target": os.path.join(root, "view"),
                    "groupBy": ["g"],
                }
            }
        )
    with pytest.raises(SpecError, match="not both"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "src"}},
                    "target": os.path.join(root, "view"),
                    "groupBy": ["g"],
                    "aggregates": {"n": "count(*)"},
                    "select": ["k"],
                }
            }
        )


def test_aggregate_null_group_key_fails_loud(spark, tmp_path):
    """A NULL group key would silently duplicate its group on every
    refresh (merge equality never matches NULL) — the refresh job must
    fail instead, naming the key."""
    root = str(tmp_path)
    src = _grouped_source(spark, root)
    src.append(
        spark.createDataFrame([(999, None, 90)], "k long, g string, v long")
    )
    with pytest.raises(Exception, match="groupBy key"):
        run_job(spark, _agg_job(root))


def test_view_over_view_stacks(spark, tmp_path):
    """A row-level view is itself a versioned table: enable row
    tracking ON THE VIEW and a second materialize job stacks on it —
    the pipeline shape (bronze → silver → gold) falls out of the same
    primitive, refreshed in dependency order."""
    root = str(tmp_path)
    src = _source(spark, root, n=40)
    job1 = _job(root)  # view: k, v2 = v*2 where v >= 50
    run_job(spark, job1)
    view1 = VersionedTable(spark, os.path.join(root, "view"))
    view1.enable_row_tracking()
    job2 = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "view"}},
            "target": os.path.join(root, "gold"),
            "select": ["k", "v2 + 1 AS v3"],
            "where": "v2 >= 200",
        }
    }
    res = run_job(spark, job2)
    assert res.mode == "initial"
    gold = VersionedTable(spark, os.path.join(root, "gold"))
    src.update("k = 30", {"v": "640"})
    src.delete("k = 25")
    # dependency-ordered refresh: source → view1 → gold
    assert run_job(spark, job1).mode == "incremental"
    assert run_job(spark, job2).mode == "incremental"
    got = {(r.k, r.v3) for r in gold.read().select("k", "v3").collect()}
    want = {
        (r.k, r.v * 2 + 1)
        for r in src.read().where("v >= 50 AND v * 2 >= 200").collect()
    }
    assert got == want


def test_cli_runs_materialize_job(spark, tmp_path):
    """python -m as_etl_storage_spark materialize.json prints the
    refresh report as one JSON object."""
    import json
    import subprocess
    import sys

    root = str(tmp_path)
    _source(spark, root)
    spec = _job(root)
    spec_path = os.path.join(root, "job.json")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    out = subprocess.run(
        [sys.executable, "-m", "as_etl_storage_spark", spec_path],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["mode"] == "initial"
    assert report["view_path"] == os.path.join(root, "view")
    assert report["source_version"] >= 0


def _mm_job(root):
    return {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "groupBy": ["g"],
            "aggregates": {
                "n": "count(*)",
                "s": "sum(v)",
                "m": "avg(v)",
                "lo": "min(v)",
                "hi": "max(v)",
            },
        }
    }


def _mm_source(spark, root):
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.createDataFrame(
            [("a", 1.0), ("a", 5.0), ("b", None), ("b", 3.0), ("c", 7.0)],
            "g string, v double",
        )
    )
    return src


def _mm_assert_matches(spark, src, root, when):
    view = VersionedTable(spark, os.path.join(root, "view"))
    got = view.read().select("g", "n", "s", "m", "lo", "hi")
    fresh = (
        src.read()
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("m"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    assert (
        got.exceptAll(fresh).count() == 0
        and fresh.exceptAll(got).count() == 0
    ), f"min/max/avg view diverged {when}"


def test_minmax_avg_view_dml_cycle(spark, tmp_path):
    """min/max fold on inserts, recompute ONLY the groups whose stored
    extreme a removal may have invalidated; avg folds on hidden
    sum/count state. Each refresh is checked for exact equality with a
    from-scratch aggregation, and ``recomputed`` is asserted to be
    zero exactly when no extreme was threatened — the steady-state
    claim (no source scan at all) made measurable."""
    root = str(tmp_path)
    src = _mm_source(spark, root)
    r = run_job(spark, _mm_job(root))
    assert r.mode == "initial"
    _mm_assert_matches(spark, src, root, "after the initial build")

    # pure inserts: fold, never recompute
    src.append(
        spark.createDataFrame(
            [("a", 0.5), ("d", 2.0)], "g string, v double"
        )
    )
    r = run_job(spark, _mm_job(root))
    assert r.mode == "incremental" and r.recomputed == 0, r
    _mm_assert_matches(spark, src, root, "after clean inserts")

    # delete a NON-extreme row (a holds {0.5, 1, 5}): still no recompute
    src.delete("g = 'a' AND v = 1.0")
    r = run_job(spark, _mm_job(root))
    assert r.recomputed == 0, r
    _mm_assert_matches(spark, src, root, "after a non-extreme delete")

    # delete a's max: its witness is gone -> exactly one dirty group
    src.delete("g = 'a' AND v = 5.0")
    r = run_job(spark, _mm_job(root))
    assert r.recomputed == 1, r
    _mm_assert_matches(spark, src, root, "after deleting the max witness")

    # kill a whole group: dirty (its row WAS the extreme), then gone
    src.delete("g = 'c'")
    run_job(spark, _mm_job(root))
    view = VersionedTable(spark, os.path.join(root, "view"))
    assert view.read().where("g = 'c'").count() == 0
    _mm_assert_matches(spark, src, root, "after a whole-group kill")

    # NEW group with in-range churn (+1.0, delete it, +9.0): the added
    # extreme 1.0 was itself removed -> must recompute, min reads 9.0
    src.append(spark.createDataFrame([("e", 1.0)], "g string, v double"))
    src.delete("g = 'e'")
    src.append(spark.createDataFrame([("e", 9.0)], "g string, v double"))
    r = run_job(spark, _mm_job(root))
    assert r.recomputed == 1, r
    assert view.read().where("g = 'e'").collect()[0].lo == 9.0
    _mm_assert_matches(spark, src, root, "after new-group churn")

    # update across the extreme, then a group-key move: the vacated
    # group recomputes (possibly to all-NULL aggregates over a
    # surviving NULL-valued row), the receiving group folds
    src.update("g = 'b' AND v = 3.0", {"v": "100.0"})
    r = run_job(spark, _mm_job(root))
    _mm_assert_matches(spark, src, root, "after an extreme-raising update")
    src.update("g = 'b' AND v = 100.0", {"g": "'d'"})
    r = run_job(spark, _mm_job(root))
    _mm_assert_matches(spark, src, root, "after a group-key move")
    b = view.read().where("g = 'b'").collect()[0]
    assert b.n == 1 and b.lo is None and b.hi is None and b.m is None


def test_minmax_large_dirty_set_semi_join_path(spark, tmp_path):
    """More than 64 dirty groups takes the broadcast-semi-join scoped
    recompute instead of literal predicates — same exact answer."""
    root = str(tmp_path)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.range(300).select(
            (F.col("id") % 100).cast("string").alias("g"),
            F.col("id").cast("double").alias("v"),
        )
    )
    job = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "groupBy": ["g"],
            "aggregates": {"n": "count(*)", "hi": "max(v)"},
        }
    }
    run_job(spark, job)
    # every group's max row is id >= 200 -> all 100 groups go dirty
    src.delete("v >= 200")
    r = run_job(spark, job)
    assert r.recomputed == 100, r
    view = VersionedTable(spark, os.path.join(root, "view"))
    got = view.read().select("g", "n", "hi")
    fresh = (
        src.read()
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.max("v").alias("hi"))
    )
    assert (
        got.exceptAll(fresh).count() == 0
        and fresh.exceptAll(got).count() == 0
    )


def _enrich_tables(spark, root):
    src = VersionedTable(spark, os.path.join(root, "fact"))
    src.overwrite(
        spark.createDataFrame(
            [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, "x", 40.0)],
            "id long, k string, v double",
        )
    )
    src.enable_row_tracking()
    dim = VersionedTable(spark, os.path.join(root, "dim"))
    dim.overwrite(
        spark.createDataFrame(
            [("x", "Xray", 1.5), ("y", "Yankee", 2.0)],
            "k string, name string, rate double",
        )
    )
    return src, dim


def _enrich_job(root, how="left", **overrides):
    return {
        "materialize": {
            "connection": {"url": root, "table": {"name": "fact"}},
            "target": os.path.join(root, "view"),
            "join": {
                "connection": {"table": {"name": "dim"}},
                "on": ["k"],
                "how": how,
            },
            "select": [
                "id",
                "k",
                "v",
                "name",
                "v * coalesce(rate, 1.0) AS priced",
            ],
            **overrides,
        }
    }


def _enrich_assert(spark, src, dim, root, how, when):
    view = VersionedTable(spark, os.path.join(root, "view"))
    got = view.read().select("id", "k", "v", "name", "priced")
    fresh = (
        src.read()
        .join(dim.read(), "k", how)
        .select(
            "id",
            "k",
            "v",
            "name",
            (F.col("v") * F.coalesce("rate", F.lit(1.0))).alias("priced"),
        )
    )
    assert (
        got.exceptAll(fresh).count() == 0
        and fresh.exceptAll(got).count() == 0
    ), f"enrichment view diverged {when}"


def test_enrichment_view_two_phase_refresh(spark, tmp_path):
    """The join form refreshes from BOTH change feeds: source DML is
    id-keyed (phase A, recomputed==0 when the dim is untouched); dim
    DML recomputes only the source rows holding affected join keys
    (phase B, recomputed == affected key count). Exact equality with a
    from-scratch join at every step."""
    root = str(tmp_path)
    src, dim = _enrich_tables(spark, root)
    job = _enrich_job(root)
    r = run_job(spark, job)
    assert r.mode == "initial"
    _enrich_assert(spark, src, dim, root, "left", "after the build")

    # fact-only: zero dim keys recomputed
    src.append(
        spark.createDataFrame([(5, "y", 50.0)], "id long, k string, v double")
    )
    r = run_job(spark, job)
    assert r.mode == "incremental" and r.recomputed == 0, r
    _enrich_assert(spark, src, dim, root, "left", "after a fact append")

    # dim-only: exactly the touched key, and only its rows re-derive
    dim.update("k = 'x'", {"rate": "3.0"})
    r = run_job(spark, job)
    assert r.mode == "incremental" and r.recomputed == 1 and r.upserts == 2, r
    _enrich_assert(spark, src, dim, root, "left", "after a dim update")

    # dim insert fills left-join NULLs for k=z
    dim.append(
        spark.createDataFrame(
            [("z", "Zulu", 9.0)], "k string, name string, rate double"
        )
    )
    r = run_job(spark, job)
    assert r.recomputed == 1, r
    _enrich_assert(spark, src, dim, root, "left", "after a dim insert")

    # dim delete: left join keeps the rows, dim columns go NULL
    dim.delete("k = 'y'")
    r = run_job(spark, job)
    _enrich_assert(spark, src, dim, root, "left", "after a dim delete")

    # both sides in one refresh
    src.delete("id = 1")
    src.update("id = 4", {"v": "44.0"})
    dim.update("k = 'z'", {"name": "'ZULU'"})
    r = run_job(spark, job)
    assert r.mode == "incremental", r
    _enrich_assert(spark, src, dim, root, "left", "after mixed DML")

    r = run_job(spark, job)
    assert r.mode == "noop", r
    # layout-only on the source: bookmark, zero view files touched
    view = VersionedTable(spark, os.path.join(root, "view"))
    files = sorted(view._state(view.latest_version()))
    src.compact(target_file_bytes=1 << 30)
    r = run_job(spark, job)
    assert r.mode == "bookmark", r
    assert sorted(view._state(view.latest_version())) == files


def test_enrichment_inner_join_dim_delete_drops_rows(spark, tmp_path):
    root = str(tmp_path)
    src, dim = _enrich_tables(spark, root)
    job = _enrich_job(root, how="inner")
    run_job(spark, job)
    _enrich_assert(spark, src, dim, root, "inner", "after the build")
    dim.delete("k = 'x'")
    r = run_job(spark, job)
    assert r.deletes == 2 and r.recomputed == 1, r
    _enrich_assert(spark, src, dim, root, "inner", "after the dim delete")


def test_enrichment_guards(spark, tmp_path):
    root = str(tmp_path)
    src, dim = _enrich_tables(spark, root)
    # duplicate dim keys are refused by name, not silently fanned out
    dim.append(
        spark.createDataFrame(
            [("x", "DUP", 0.0)], "k string, name string, rate double"
        )
    )
    with pytest.raises(SpecError, match="not unique"):
        run_job(spark, _enrich_job(root))
    dim.delete("name = 'DUP'")
    # a dim projection that drops the join keys is refused
    with pytest.raises(SpecError, match="carry the join keys"):
        run_job(
            spark,
            _enrich_job(
                root,
                join={
                    "connection": {"table": {"name": "dim"}},
                    "on": ["k"],
                    "select": ["name"],
                },
            ),
        )
    # a non-key column collision is refused (both sides have "v")
    dim2 = VersionedTable(spark, os.path.join(root, "dim2"))
    dim2.overwrite(
        spark.createDataFrame([("x", 1.0)], "k string, v double")
    )
    with pytest.raises(SpecError, match="collide"):
        run_job(
            spark,
            _enrich_job(
                root,
                join={
                    "connection": {"table": {"name": "dim2"}},
                    "on": ["k"],
                },
            ),
        )
    # join + aggregate form is refused at spec parse
    with pytest.raises(SpecError, match="stack"):
        JobSpec.from_json(
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "fact"}},
                    "target": os.path.join(root, "view"),
                    "join": {
                        "connection": {"table": {"name": "dim"}},
                        "on": ["k"],
                    },
                    "groupBy": ["k"],
                    "aggregates": {"n": "count(*)"},
                }
            }
        )
    # aggregates inside the select are still refused over the joined row
    with pytest.raises(SpecError, match="row-level"):
        run_job(spark, _enrich_job(root, select=["k", "sum(v) AS s"]))


def test_source_schema_evolution_rebuilds_default_select_view(
    spark, tmp_path
):
    """A default-select view whose SOURCE evolves additively cannot
    apply the new column through the id-keyed merges (the view schema
    lacks it) — the refresh must detect the shape drift and rebuild,
    carrying the new column into the view."""
    root = str(tmp_path)
    src = _grouped_source(spark, root, tracked=True)
    job = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
        }
    }
    r = run_job(spark, job)
    assert r.mode == "initial"
    src.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            F.lit("9").alias("g"),
            (F.col("id") * 10).alias("v"),
            F.lit("tagged").alias("tag"),
        ),
        merge_schema=True,
    )
    r = run_job(spark, job)
    assert r.mode == "full", r
    view = VersionedTable(spark, os.path.join(root, "view"))
    assert "tag" in view.read().columns
    got = view.read().select("k", "g", "v", "tag")
    fresh = src.read().select("k", "g", "v", "tag")
    assert (
        got.exceptAll(fresh).count() == 0
        and fresh.exceptAll(got).count() == 0
    )
    # steady state resumes incrementally on the evolved schema
    src.delete("k % 4 = 0")
    r = run_job(spark, job)
    assert r.mode == "incremental", r


def test_enrich_then_aggregate_stack(spark, tmp_path):
    """The documented composition story for join+groupBy: materialize
    the enrichment first, then stack an aggregate view on the enriched
    view (views are versioned tables with their own change feeds). DML
    on fact AND dim flows through BOTH refreshes incrementally."""
    root = str(tmp_path)
    src, dim = _enrich_tables(spark, root)
    enrich = _enrich_job(root)
    agg = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "view"}},
            "target": os.path.join(root, "by_name"),
            "groupBy": ["name"],
            "aggregates": {"n": "count(*)", "total": "sum(priced)"},
            "where": "name IS NOT NULL",
        }
    }
    run_job(spark, enrich)
    r = run_job(spark, agg)
    assert r.mode == "initial"

    def check(when):
        got = VersionedTable(spark, os.path.join(root, "by_name")).read()
        fresh = (
            src.read()
            .join(dim.read(), "k", "left")
            .select(
                "name",
                (F.col("v") * F.coalesce("rate", F.lit(1.0))).alias(
                    "priced"
                ),
            )
            .where("name IS NOT NULL")
            .groupBy("name")
            .agg(F.count("*").alias("n"), F.sum("priced").alias("total"))
        )
        got = got.select("name", "n", "total")
        assert (
            got.exceptAll(fresh).count() == 0
            and fresh.exceptAll(got).count() == 0
        ), f"stacked aggregate diverged {when}"

    check("after the builds")
    src.append(
        spark.createDataFrame([(9, "x", 90.0)], "id long, k string, v double")
    )
    dim.update("k = 'y'", {"rate": "5.0"})
    r1 = run_job(spark, enrich)
    r2 = run_job(spark, agg)
    assert r1.mode == "incremental" and r2.mode == "incremental", (r1, r2)
    check("after fact+dim DML through both layers")


def _stack_pipeline(root):
    """by_name (declared FIRST) depends on enriched (declared second):
    the spec's stable toposort must run enriched before it."""
    return {
        "pipeline": [
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "view"}},
                    "target": os.path.join(root, "by_name"),
                    "groupBy": ["name"],
                    "aggregates": {"cnt": "count(*)", "t": "sum(priced)"},
                    "where": "name IS NOT NULL",
                }
            },
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "fact"}},
                    "target": os.path.join(root, "view"),
                    "join": {
                        "connection": {"table": {"name": "dim"}},
                        "on": ["k"],
                    },
                    "select": [
                        "id",
                        "k",
                        "v",
                        "name",
                        "v * rate AS priced",
                    ],
                }
            },
            {
                "maintenance": {
                    "connection": {"url": root, "table": {"name": "view"}},
                    "checkpoint": True,
                }
            },
        ]
    }


def test_pipeline_orders_views_by_dependency(spark, tmp_path):
    """One pipeline tick refreshes a stacked DAG bottom-up regardless
    of declaration order, and the downstream view reflects THIS tick's
    upstream changes — the freshness property the toposort exists for."""
    root = str(tmp_path)
    src, dim = _enrich_tables(spark, root)
    res = run_job(spark, _stack_pipeline(root))
    kinds = [type(r).__name__ for r in res.steps]
    assert kinds == [
        "MaterializeResult",
        "MaterializeResult",
        "MaintenanceResult",
    ]
    assert res.steps[0].view_path.endswith("view")
    assert res.steps[1].view_path.endswith("by_name")
    # DML on both bases, one tick, downstream exact
    src.append(
        spark.createDataFrame([(9, "x", 90.0)], "id long, k string, v double")
    )
    dim.update("k = 'y'", {"rate": "7.0"})
    res = run_job(spark, _stack_pipeline(root))
    assert res.steps[0].mode == "incremental"
    assert res.steps[1].mode == "incremental"
    got = (
        VersionedTable(spark, os.path.join(root, "by_name"))
        .read()
        .select("name", "cnt", "t")
    )
    fresh = (
        src.read()
        .join(dim.read(), "k", "left")
        .where("name IS NOT NULL")
        .groupBy("name")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("v") * F.col("rate")).alias("t"),
        )
    )
    assert (
        got.exceptAll(fresh).count() == 0
        and fresh.exceptAll(got).count() == 0
    )


def test_pipeline_spec_guards(spark, tmp_path):
    root = str(tmp_path)
    with pytest.raises(SpecError, match="cycle"):
        JobSpec.from_json(
            {
                "pipeline": [
                    {
                        "materialize": {
                            "connection": {
                                "url": root,
                                "table": {"name": "b"},
                            },
                            "target": os.path.join(root, "a"),
                        }
                    },
                    {
                        "materialize": {
                            "connection": {
                                "url": root,
                                "table": {"name": "a"},
                            },
                            "target": os.path.join(root, "b"),
                        }
                    },
                ]
            }
        )
    with pytest.raises(SpecError, match="same target"):
        JobSpec.from_json(
            {
                "pipeline": [
                    {
                        "materialize": {
                            "connection": {
                                "url": root,
                                "table": {"name": "x"},
                            },
                            "target": os.path.join(root, "dup"),
                        }
                    },
                    {
                        "materialize": {
                            "connection": {
                                "url": root,
                                "table": {"name": "y"},
                            },
                            "target": os.path.join(root, "dup"),
                        }
                    },
                ]
            }
        )
    with pytest.raises(SpecError, match="no consumer|must write"):
        JobSpec.from_json(
            {
                "pipeline": [
                    {
                        "reader": {
                            "connection": {
                                "url": root,
                                "table": {"name": "t"},
                            },
                            "column": ["*"],
                        }
                    }
                ]
            }
        )
    with pytest.raises(SpecError, match="do not nest"):
        JobSpec.from_json({"pipeline": [{"pipeline": []}]})
    with pytest.raises(SpecError, match="non-empty"):
        JobSpec.from_json({"pipeline": []})
    # a self-dependent view is a cycle of one
    with pytest.raises(SpecError, match="cycle"):
        JobSpec.from_json(
            {
                "pipeline": [
                    {
                        "materialize": {
                            "connection": {
                                "url": root,
                                "table": {"name": "self"},
                            },
                            "target": os.path.join(root, "self"),
                        }
                    }
                ]
            }
        )


def test_pipeline_with_ingest_step(spark, tmp_path):
    """Ingest (reader→writer into a versioned table) runs FIRST, so a
    view over the ingest target refreshes on this tick's rows."""
    root = str(tmp_path)
    # seed the versioned sink + row tracking so the view can key on ids
    land = VersionedTable(spark, os.path.join(root, "landed"))
    land.overwrite(
        spark.createDataFrame([(0, 0.0)], "l_orderkey long, l_quantity double")
    )
    land.enable_row_tracking()
    pipeline = {
        "pipeline": [
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "landed"}},
                    "target": os.path.join(root, "heavy"),
                    "where": "l_quantity > 45",
                }
            },
            {
                "reader": {
                    "connection": {
                        "url": "/root/testdata/sf0.001",
                        "table": {"name": "lineitem"},
                    },
                    "column": ["l_orderkey", "l_quantity"],
                    "where": "l_quantity > 40",
                },
                "writer": {
                    "connection": {"url": root, "table": {"name": "landed"}},
                    "writeMode": "insert",
                    "versioned": True,
                },
            },
        ]
    }
    res = run_job(spark, pipeline)
    # ingest ran first despite being declared second
    assert type(res.steps[0]).__name__ == "WriteResult"
    assert res.steps[1].mode in ("initial", "incremental", "full")
    got = VersionedTable(spark, os.path.join(root, "heavy")).read()
    fresh = land.read().where("l_quantity > 45")
    assert got.count() == fresh.count() and got.count() > 0


def test_avg_only_view_null_and_zero_count_groups(spark, tmp_path):
    """The pure-avg path (no min/max declared → no dirty machinery):
    NULLs are ignored, deleting a group's only non-NULL value folds
    its count state to zero and the exposed avg to NULL — all through
    the abelian merge, zero source re-reads."""
    root = str(tmp_path)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.createDataFrame(
            [("a", 2.0), ("a", 4.0), ("b", None), ("b", 8.0)],
            "g string, v double",
        )
    )
    job = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "groupBy": ["g"],
            "aggregates": {"m": "avg(v)"},
        }
    }
    run_job(spark, job)
    view = VersionedTable(spark, os.path.join(root, "view"))
    rows = {r.g: r.m for r in view.read().collect()}
    assert rows == {"a": 3.0, "b": 8.0}
    src.delete("g = 'b' AND v = 8.0")
    r = run_job(spark, job)
    assert r.mode == "incremental" and r.recomputed == 0, r
    rows = {r.g: r.m for r in view.read().collect()}
    assert rows == {"a": 3.0, "b": None}, rows
    src.append(spark.createDataFrame([("b", 5.0)], "g string, v double"))
    r = run_job(spark, job)
    assert r.recomputed == 0, r
    rows = {r.g: r.m for r in view.read().collect()}
    assert rows == {"a": 3.0, "b": 5.0}, rows


def test_count_expr_counts_non_null_incrementally(spark, tmp_path):
    """count(expr) counts non-NULL values and folds sign-weighted like
    count(*) — and count(DISTINCT ...) stays refused by name."""
    root = str(tmp_path)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.overwrite(
        spark.createDataFrame(
            [("a", 1.0), ("a", None), ("b", 2.0)], "g string, v double"
        )
    )
    job = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "groupBy": ["g"],
            "aggregates": {"rows": "count(*)", "vals": "count(v)"},
        }
    }
    run_job(spark, job)
    view = VersionedTable(spark, os.path.join(root, "view"))
    got = {(r.g, r.rows, r.vals) for r in view.read().collect()}
    assert got == {("a", 2, 1), ("b", 1, 1)}
    src.append(
        spark.createDataFrame([("a", 9.0), ("b", None)], "g string, v double")
    )
    src.delete("g = 'a' AND v = 1.0")
    r = run_job(spark, job)
    assert r.mode == "incremental", r
    got = {(r.g, r.rows, r.vals) for r in view.read().collect()}
    assert got == {("a", 2, 1), ("b", 2, 1)}, got
    with pytest.raises(SpecError, match="DISTINCT"):
        run_job(
            spark,
            {
                "materialize": {
                    "connection": {"url": root, "table": {"name": "src"}},
                    "target": os.path.join(root, "view2"),
                    "groupBy": ["g"],
                    "aggregates": {"d": "count(distinct v)"},
                }
            },
        )


def test_check_reports_staleness_without_touching(spark, tmp_path):
    """check: true answers what the next refresh WOULD do — rebuild
    before the view exists, none at parity, incremental with the
    behind count after DML — and commits nothing."""
    root = str(tmp_path)
    src = _grouped_source(spark, root, tracked=True)
    job = {
        "materialize": {
            "connection": {"url": root, "table": {"name": "src"}},
            "target": os.path.join(root, "view"),
            "where": "v >= 50",
        }
    }
    status = {
        "materialize": {**job["materialize"], "check": True}
    }
    r = run_job(spark, status)
    assert r.mode == "status" and r.needs == "rebuild" and r.behind is None
    run_job(spark, job)
    view = VersionedTable(spark, os.path.join(root, "view"))
    v0 = view.latest_version()
    r = run_job(spark, status)
    assert (r.mode, r.needs, r.behind) == ("status", "none", 0), r
    src.delete("k % 5 = 0")
    src.update("k % 7 = 1", {"v": "v + 1"})
    r = run_job(spark, status)
    assert (r.needs, r.behind) == ("incremental", 2), r
    # a changed definition reports rebuild
    r = run_job(
        spark,
        {
            "materialize": {
                **job["materialize"],
                "where": "v >= 60",
                "check": True,
            }
        },
    )
    assert r.needs == "rebuild", r
    # nothing was committed by any status call
    assert view.latest_version() == v0
