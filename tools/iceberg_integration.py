"""Standalone Iceberg integration run: drive the IcebergSink seam against a
REAL local Iceberg catalog (SparkCatalog, ``hadoop`` type, temp warehouse) —
write (create-with-bucket-partitioning) → append → read_chunk →
list_chunk_ids → DELETE-based delete_chunk, the full exactly-once surface
pipeline.run's resume uses for catalog sinks.

Needs the public ``iceberg-spark-runtime`` Maven artifact, which this sandbox
cannot fetch (no DNS/network — see the Iceberg note in README.md). Run it
wherever a jar is available:

    python tools/iceberg_integration.py /path/to/iceberg-spark-runtime-*.jar

or drop the jar under ``<repo>/jars/`` / set ``LUMBERMILL_ICEBERG_JAR`` and
``tests/test_iceberg_integration.py`` will run this as a pytest instead of
skipping. Runs in its OWN JVM (spark.jars must be set at launch), which is
why this is a subprocess script, not a fixture-session test.

Reference contract being exercised: the poster delivery layer
(poster.go:84-111; influxdb-go influxdb.go:384-419) mapped onto table
commits, and resume's transactional undo (lineage.cleanup_orphans analog for
fs_managed=False sinks).
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession


def main(jar: str) -> None:
    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark = (
        SparkSession.builder.appName("lumbermill-iceberg-integration")
        .master("local[4]")
        .config("spark.jars", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.lm", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lm.type", "hadoop")
        .config("spark.sql.catalog.lm.warehouse", wh)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lumbermill_spark import sinks

    sink = sinks.make_sink(spark, "iceberg", n_buckets=4)
    assert not sink.fs_managed

    df = spark.createDataFrame(
        [("t.aaa", 1_000_000, 200, 5), ("t.bbb", 2_000_000, 503, 9)],
        "token string, time long, status int, service int",
    )
    path = "/out/sinks/router"  # only the basename feeds the table identity
    sink.write(df, path, "run1_0000", "bucket")  # create-with-data
    sink.write(df, path, "run1_0001", "bucket")  # append

    got = sink.read_chunk(spark, path, "run1_0000")
    assert got is not None and got.count() == 2, "read_chunk"
    assert sink.list_chunk_ids(spark, path) == {"run1_0000", "run1_0001"}, "list"

    # the consistent-hash-ring analog really landed as hidden partitioning
    ddl = spark.sql("SHOW CREATE TABLE lm.lumbermill.router").collect()[0][0]
    assert "bucket(4, token)" in ddl, f"partition spec missing: {ddl}"

    # transactional resume undo
    assert sink.delete_chunk(spark, path, "run1_0001") is True
    assert sink.list_chunk_ids(spark, path) == {"run1_0000"}, "post-delete list"
    assert spark.table("lm.lumbermill.router").count() == 2

    # idempotent second delete
    assert sink.delete_chunk(spark, path, "run1_0001") is True  # no rows, still a valid DELETE
    assert spark.table("lm.lumbermill.router").count() == 2
    print("ICEBERG-INTEGRATION-OK")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
