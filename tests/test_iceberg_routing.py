"""Iceberg-vs-parquet routing (K1/K7): this sandbox has no Iceberg
jars, so the Iceberg arm is pinned with recorder fakes — the routing
decision and the exact writeTo(...).overwritePartitions() /
read.format("iceberg").load() calls — while the parquet arm runs for
real (and is also exercised end-to-end by the resume suite)."""

from __future__ import annotations

import pytest

from eugl_spark.sources import pages as P


class _RecorderReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def load(self, name):
        self.log.append(("load", name))
        return "ICEBERG_DF"

    def schema(self, s):
        self.log.append(("schema", s.simpleString()))
        return self

    def parquet(self, path):
        self.log.append(("parquet", path))
        return "PARQUET_DF"


class _FakeSpark:
    def __init__(self, log):
        self._log = log

    @property
    def read(self):
        return _RecorderReader(self._log)


class _RecorderWriteTo:
    def __init__(self, log, target):
        self.log, self.target = log, target

    def overwritePartitions(self):
        self.log.append(("overwritePartitions", self.target))


class _RecorderWrite:
    def __init__(self, log):
        self.log = log

    def mode(self, m):
        self.log.append(("mode", m))
        return self

    def option(self, k, v):
        self.log.append(("option", k, v))
        return self

    def partitionBy(self, *cols):
        self.log.append(("partitionBy", cols))
        return self

    def parquet(self, path):
        self.log.append(("parquet", path))


class _FakeDF:
    def __init__(self, log):
        self._log = log
        self.sparkSession = _FakeSpark(log)

    def writeTo(self, target):
        self._log.append(("writeTo", target))
        return _RecorderWriteTo(self._log, target)

    @property
    def write(self):
        return _RecorderWrite(self._log)


def test_env_has_no_iceberg(spark):
    # documents the sandbox constraint the mocks below stand in for
    assert P.iceberg_available(spark) is False


def test_read_routes_table_name_to_iceberg(monkeypatch):
    log: list = []
    monkeypatch.setattr(P, "iceberg_available", lambda s: True)
    out = P.read_pages(_FakeSpark(log), "catalog.db.pages")
    assert out == "ICEBERG_DF"
    assert log == [("format", "iceberg"), ("load", "catalog.db.pages")]


def test_read_routes_path_to_schema_pinned_parquet(monkeypatch):
    log: list = []
    # even WITH iceberg present, a path must go to parquet
    monkeypatch.setattr(P, "iceberg_available", lambda s: True)
    out = P.read_pages(_FakeSpark(log), "/data/pages")
    assert out == "PARQUET_DF"
    assert log[0][0] == "schema"  # pinned schema, never inference
    assert "url" in log[0][1] and "html" in log[0][1]
    assert log[1] == ("parquet", "/data/pages")


def test_read_table_name_without_jars_is_hard_error(monkeypatch):
    """A table-NAME source with no Iceberg runtime must error clearly,
    never silently fall through to a parquet read of a directory
    literally named 'catalog.db.pages'."""
    log: list = []
    monkeypatch.setattr(P, "iceberg_available", lambda s: False)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        P.read_pages(_FakeSpark(log), "catalog.db.pages")
    assert log == []  # no read was attempted


def test_write_table_name_without_jars_is_hard_error(monkeypatch):
    log: list = []
    monkeypatch.setattr(P, "iceberg_available", lambda s: False)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        P.write_pages(_FakeDF(log), "catalog.db.pages")
    assert log == []


def test_write_routes_table_name_to_overwrite_partitions(monkeypatch):
    log: list = []
    monkeypatch.setattr(P, "iceberg_available", lambda s: True)
    P.write_pages(_FakeDF(log), "catalog.db.pages")
    assert log == [
        ("writeTo", "catalog.db.pages"),
        ("overwritePartitions", "catalog.db.pages"),
    ]


def test_write_routes_path_to_dynamic_overwrite(monkeypatch):
    log: list = []
    monkeypatch.setattr(P, "iceberg_available", lambda s: True)
    P.write_pages(_FakeDF(log), "/data/out")
    assert ("mode", "overwrite") in log
    assert ("option", "partitionOverwriteMode", "dynamic") in log
    assert ("partitionBy", ("bucket",)) in log
    assert ("parquet", "/data/out") in log


def test_write_path_arm_runs_for_real(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "id long, v string, bucket int"
    )
    P.write_pages(df, str(tmp_path / "out"))
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 2
    assert sorted(back.columns) == ["bucket", "id", "v"]
