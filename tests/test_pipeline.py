"""End-to-end pipeline + lineage/resume semantics (the graceful-shutdown /
exactly-once analog, SURVEY §2.1 #28)."""

import os

import pytest

from lumbermill_spark import pipeline
from lumbermill_spark.datagen import ensure_transcripts


@pytest.fixture(scope="module")
def small_input(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lm_in"))
    spark.read.parquet(ensure_transcripts(0.001)).limit(4000).repartition(4).write.mode(
        "overwrite"
    ).parquet(p)
    return p


def test_run_and_resume(spark, small_input, tmp_path):
    out = str(tmp_path / "out")
    cfg = pipeline.PipelineConfig(chunk_files=2)
    res = pipeline.run(spark, small_input, out, cfg)
    assert res.chunks == 2 and res.rows_in == 4000
    assert res.class_counts["lines"] == 4000
    assert sum(v for k, v in res.class_counts.items() if k not in ("lines", "logfmt_parse_error")) == 4000
    n1 = spark.read.parquet(os.path.join(out, "sinks", "router")).count()
    assert n1 == res.sink_rows["router"] > 0

    # full resume: nothing left to do, sinks unchanged
    res2 = pipeline.run(spark, small_input, out, cfg, resume=True)
    assert res2.chunks == 0 and res2.rows_in == 0
    assert spark.read.parquet(os.path.join(out, "sinks", "router")).count() == n1

    # crash simulation: sink rows written but the chunk marker missing (a
    # crash between the last sink append and commit_chunk). Resume must
    # (a) remove the orphaned chunk partitions, (b) reprocess exactly that
    # chunk, and (c) leave sink counts IDENTICAL to a clean run — this is
    # the exactly-once guarantee (without orphan cleanup the rerun would
    # append duplicates and the count would be ~1.5x).
    led = os.path.join(out, "lineage_ledger")
    marker = sorted(f for f in os.listdir(led) if f.endswith(".done"))[0]
    os.unlink(os.path.join(led, marker))
    res3 = pipeline.run(spark, small_input, out, cfg, resume=True)
    assert res3.chunks == 1 and res3.rows_in == 2000
    assert spark.read.parquet(os.path.join(out, "sinks", "router")).count() == n1
    for sink, expected in res.sink_rows.items():
        got = spark.read.parquet(os.path.join(out, "sinks", sink)).count()
        assert got == expected, f"{sink}: {got} != {expected} after crash-resume"
    # ledger is clean too: every surviving chunk partition has a marker
    from lumbermill_spark import lineage as lin

    done = lin.done_chunk_ids(out)
    on_disk = {d[len("chunk_id=") :] for d in os.listdir(led) if d.startswith("chunk_id=")}
    assert on_disk <= done


def test_lineage_ledger_contents(spark, small_input, tmp_path):
    out = str(tmp_path / "out2")
    pipeline.run(spark, small_input, out, pipeline.PipelineConfig())
    led = spark.read.parquet(os.path.join(out, "lineage_ledger"))
    assert {c for c in led.columns} >= {"source_file", "msg_class", "rows", "run_id", "chunk_id"}
    total = led.groupBy().sum("rows").collect()[0][0]
    assert total == 4000
    assert led.select("source_file").distinct().count() == 4


def test_noop_sink(spark, small_input, tmp_path):
    res = pipeline.run(
        spark, small_input, str(tmp_path / "out3"), pipeline.PipelineConfig(sink_format="noop")
    )
    assert res.rows_in == 4000 and res.sink_rows["router"] > 0
