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
