"""Engine facade tests — the embeddable ad-hoc path (SURVEY.md §3.3:
Open -> FetchTable / FetchRecord / BatchExec)."""

from __future__ import annotations

import pytest

from as_etl_storage_spark import Engine
from as_etl_storage_spark.writers.writer import WriterError

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def test_table_read_project_filter(eng):
    df = eng.source("parquet", SF).table(
        "lineitem", columns=["l_orderkey", "l_quantity"], where="l_quantity > 40"
    )
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() > 0
    assert df.where("l_quantity <= 40").count() == 0


def test_schema_probe_and_listing(eng):
    src = eng.source("parquet", SF)
    assert "lineitem" in src.tables()
    schema = src.schema("nation")
    assert [f.name for f in schema.fields] == [
        "n_nationkey", "n_name", "n_regionkey"
    ]


def test_sql_over_registered_view(eng):
    df = eng.source("parquet", SF).table("nation")
    eng.register("nation_v", df)
    out = eng.sql("SELECT count(*) AS n FROM nation_v").collect()
    assert out[0].n == df.count()


def test_write_roundtrip_and_modes(eng, spark, tmp_path):
    nation = eng.source("parquet", SF).table("nation")
    res = eng.write(nation, url=str(tmp_path), table="n_out")
    assert res.written == nation.count()
    # replace keyed on the pk: same rows -> same count, not doubled
    res2 = eng.write(nation, url=str(tmp_path), table="n_out", mode="replace",
                     merge_keys=["n_nationkey"])
    assert res2.written == nation.count()
    assert spark.read.parquet(res.target_path).count() == nation.count()


def test_write_csv_dialect(eng, spark, tmp_path):
    nation = eng.source("parquet", SF).table("nation")
    res = eng.write(nation, url=str(tmp_path), table="n_csv", dialect="csv")
    assert res.target_path.endswith("n_csv.csv")
    back = (spark.read.format("csv").option("header", "true")
            .load(res.target_path))
    assert back.count() == nation.count()


def test_unknown_dialect_rejected(eng, spark):
    df = eng.source("parquet", SF).table("nation")
    with pytest.raises(WriterError, match="dialect"):
        eng.write(df, url="/tmp/x", table="t", dialect="avro")
