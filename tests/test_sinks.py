"""Sink seam unit tests: dispatch, the Iceberg catalog gate, and the
chunk-partitioned parquet layout that exactly-once resume depends on."""

import os

import pytest

from lumbermill_spark import sinks


def test_make_sink_dispatch(spark):
    assert isinstance(sinks.make_sink(spark, "noop"), sinks.NoopSink)
    assert isinstance(sinks.make_sink(spark, "parquet"), sinks.ParquetSink)
    with pytest.raises(ValueError):
        sinks.make_sink(spark, "kafka")


def test_iceberg_sink_fails_loudly_without_catalog(spark):
    """No Iceberg jar/catalog in this environment: construction must raise a
    clear remediation error, never silently write nowhere."""
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        sinks.make_sink(spark, "iceberg")


def test_parquet_sink_chunk_partition_layout(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, bucket string")
    out = str(tmp_path / "s")
    sinks.ParquetSink().write(df, out, "chunkX", "bucket")
    assert os.path.isdir(os.path.join(out, "chunk_id=chunkX"))
    back = spark.read.parquet(out)
    assert back.count() == 2 and set(back.columns) >= {"id", "bucket", "chunk_id"}


def test_parquet_read_chunk_guard(spark, tmp_path):
    """read_chunk returns None for a chunk that wrote nothing (an empty
    partitioned append leaves only _SUCCESS — a raw path read would throw)."""
    out = str(tmp_path / "s2")
    sink = sinks.ParquetSink()
    empty = spark.createDataFrame([], "id long, bucket string")
    sink.write(empty, out, "chunk0", "bucket")
    assert sink.read_chunk(spark, out, "chunk0") is None
    sink.write(spark.createDataFrame([(1, "a")], "id long, bucket string"), out, "chunk1", "bucket")
    got = sink.read_chunk(spark, out, "chunk1")
    assert got is not None and got.count() == 1
    assert sink.read_chunk(spark, out, "chunk_never_written") is None


# ---- IcebergSink logic against a fake catalog (no runtime jar in sandbox):
# exercises _table / create-vs-append dispatch / partition spec / read_chunk
# so the environment-gated path cannot rot (round-2 verdict, next #4).


class _FakeWriter:
    def __init__(self, log, table):
        self.log, self.table = log, table

    def partitionedBy(self, expr):
        self.log.append(("partitionedBy", self.table, str(expr)))
        return self

    def create(self):
        self.log.append(("create", self.table))

    def append(self):
        self.log.append(("append", self.table))


class _FakeDF:
    def __init__(self, columns, log):
        self.columns, self.log = list(columns), log

    def withColumn(self, name, col):
        return _FakeDF(self.columns + [name], self.log)

    def filter(self, cond):
        self.log.append(("filter", str(cond)))
        return self

    def writeTo(self, table):
        return _FakeWriter(self.log, table)


class _FakeSpark:
    def __init__(self, tables=()):
        self.tables = set(tables)
        self.sqls = []
        self.log = []
        outer = self

        class _Conf:
            def get(self, k, d=None):
                return "org.apache.iceberg.spark.SparkCatalog"

        class _Catalog:
            def tableExists(self, t):
                return t in outer.tables

        self.conf, self.catalog = _Conf(), _Catalog()

    def sql(self, q):
        self.sqls.append(q)

    def table(self, t):
        return _FakeDF(["token", "chunk_id"], self.log)


def _iceberg(tables=()):
    fake = _FakeSpark(tables)
    return sinks.IcebergSink(fake, n_buckets=16), fake


def test_iceberg_table_ident_and_namespace(spark):
    sink, fake = _iceberg()
    assert sink._table("router") == "lm.lumbermill.router"
    assert sinks.IcebergSink.sink_name_of("/out/sinks/dyno_mem/") == "dyno_mem"
    assert any("CREATE NAMESPACE IF NOT EXISTS lm.lumbermill" in q for q in fake.sqls)


def test_iceberg_create_with_bucket_partitioning(spark):
    """First write creates the table PARTITIONED BY bucket(16, token) — the
    consistent-hash ring analog (consistenthash.go:64-73)."""
    sink, fake = _iceberg()
    df = _FakeDF(["token", "time", "status"], fake.log)
    sink.write(df, "/out/sinks/router", "c0", "bucket")
    kinds = [e[0] for e in fake.log]
    assert kinds == ["partitionedBy", "create"]
    assert "bucket(16, token)" in fake.log[0][2]
    assert fake.log[0][1] == "lm.lumbermill.router"


def test_iceberg_append_when_table_exists(spark):
    sink, fake = _iceberg(tables={"lm.lumbermill.router"})
    df = _FakeDF(["token", "time", "status"], fake.log)
    sink.write(df, "/out/sinks/router", "c1", "bucket")
    assert [e[0] for e in fake.log] == [("append")]
    assert fake.log[0][1] == "lm.lumbermill.router"


def test_iceberg_no_token_no_partition_spec(spark):
    """Metrics frames carry no token column → created unpartitioned."""
    sink, fake = _iceberg()
    df = _FakeDF(["counter", "n"], fake.log)
    assert sink.partition_spec(df) is None
    sink.write(df, "/out/metrics/class_counts", "c0", None)
    assert [e[0] for e in fake.log] == ["create"]


def test_iceberg_read_chunk(spark):
    sink, fake = _iceberg(tables={"lm.lumbermill.router"})
    assert sink.read_chunk(fake, "/out/sinks/unknown_sink", "c0") is None
    got = sink.read_chunk(fake, "/out/sinks/router", "c0")
    assert got is not None
    assert fake.log and fake.log[0][0] == "filter" and "chunk_id" in fake.log[0][1]
