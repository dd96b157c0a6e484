"""Snapshot-table abstraction: commits, time travel, incremental reads
(the Iceberg-shaped storage interface of the north_rule, on parquet)."""

import pandas as pd
import pytest

from vyperdatum_spark.sources import tables


def _df(spark, lo, hi):
    return spark.createDataFrame(
        pd.DataFrame({"k": range(lo, hi), "v": [f"r{i}" for i in range(lo, hi)]})
    )


def test_snapshot_commit_append_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = tables.write_table(_df(spark, 0, 100), t)
    s2 = tables.write_table(_df(spark, 100, 150), t, mode="append")
    s3 = tables.write_table(_df(spark, 0, 10), t, mode="overwrite")
    assert tables.snapshot_ids(t) == [s1, s2, s3]
    # current = the overwrite
    assert tables.read_table(spark, t).count() == 10
    # time travel
    assert tables.read_table(spark, t, as_of=s1).count() == 100
    assert tables.read_table(spark, t, as_of=s2).count() == 150
    # incremental: rows added by the append only
    inc = tables.incremental_rows(spark, t, since=s1, until=s2)
    assert inc.count() == 50
    assert inc.agg({"k": "min"}).collect()[0][0] == 100


def test_append_reuses_previous_data_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl2")
    s1 = tables.write_table(_df(spark, 0, 20), t)
    s2 = tables.write_table(_df(spark, 20, 30), t, mode="append")
    m1 = tables.snapshot_meta(t, s1)
    m2 = tables.snapshot_meta(t, s2)
    # fast-append: the new manifest references the OLD dirs untouched
    assert set(m1["dirs"]) < set(m2["dirs"])
    assert len(m2["dirs"]) == 2


def test_read_empty_table_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed snapshots"):
        tables.read_table(spark, str(tmp_path / "nope"))
