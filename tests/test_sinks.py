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
