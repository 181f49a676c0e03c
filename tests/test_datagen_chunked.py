"""Chunked transcript generation (sf ≥ datagen.CHUNKED_MIN_SF): bounded
memory at any scale factor, deterministic independent of worker count, part
files that the pipeline's chunk/resume machinery can operate on. No Spark
session needed — pure pyarrow."""

import os

import pyarrow.parquet as pq
import pytest

from lumbermill_spark import datagen


def _hash_dir(path: str) -> dict[str, bytes]:
    import hashlib

    out = {}
    for f in sorted(os.listdir(path)):
        h = hashlib.md5()
        h.update(open(os.path.join(path, f), "rb").read())
        out[f] = h.digest()
    return out


@pytest.fixture()
def chunked_conf(tmp_path, monkeypatch):
    monkeypatch.setattr(datagen, "CHUNKED_MIN_SF", 0.001)
    monkeypatch.setattr(datagen, "CHUNK_SF", 0.001)
    monkeypatch.setattr(
        datagen, "data_dir", lambda: str(tmp_path / ".data")
    )
    return tmp_path


def test_chunked_layout_and_determinism(chunked_conf):
    p = datagen.ensure_transcripts(0.004, workers=2)
    assert os.path.isdir(p)
    parts = sorted(os.listdir(p))
    assert parts == ["part-%05d.parquet" % i for i in range(4)]
    h1 = _hash_dir(p)

    # regeneration from scratch with a DIFFERENT worker count is byte-identical
    import shutil

    shutil.rmtree(p)
    p2 = datagen.ensure_transcripts(0.004, workers=1)
    assert _hash_dir(p2) == h1


def test_chunked_schema_and_monotone_time(chunked_conf):
    p = datagen.ensure_transcripts(0.002, workers=2)
    t0 = pq.read_table(os.path.join(p, "part-00000.parquet"))
    t1 = pq.read_table(os.path.join(p, "part-00001.parquet"))
    # same schema as the single-shot path
    single = datagen.generate_transcripts(0.001)
    assert t0.schema.equals(single.schema)
    # chunks carry distinct RNG streams (different conv universes)
    c0 = set(t0["conv_id"].to_pylist()) - {None}
    c1 = set(t1["conv_id"].to_pylist()) - {None}
    assert not (c0 & c1)
    # event time is monotone ACROSS chunks (ts offset per chunk)
    import pyarrow.compute as pc

    assert pc.max(t0["ts"]).as_py() < pc.min(t1["ts"]).as_py()


def test_small_sf_stays_single_file(chunked_conf, monkeypatch):
    monkeypatch.setattr(datagen, "CHUNKED_MIN_SF", 2.0)
    p = datagen.ensure_transcripts(0.001)
    assert os.path.isfile(p)
