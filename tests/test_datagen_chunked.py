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
    parts = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
    assert parts == ["part-%05d.parquet" % i for i in range(4)]
    # the build manifest travels with the data (underscore-prefixed: ignored
    # by Spark's parquet reader)
    assert os.path.exists(os.path.join(p, "_manifest.json"))
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


def test_off_grid_sf_raises(chunked_conf):
    """sf not on the CHUNK_SF grid must fail with a clear ValueError, not an
    assert (round-3 advice)."""
    with pytest.raises(ValueError, match="multiple of CHUNK_SF"):
        datagen.ensure_transcripts(0.0035)


def test_stale_tmpdir_regenerated(chunked_conf):
    """Leftover part files from an interrupted run under DIFFERENT generator
    constants must be discarded, not silently reused (round-3 advice): the
    manifest fingerprint (seed/chunking constants) gates tmpdir reuse."""
    import json

    p = datagen.transcripts_path(0.002)
    tmp = p + ".tmpdir"
    os.makedirs(tmp)
    # a stale part claiming to be chunk 0, plus a manifest from an older seed
    stale_part = os.path.join(tmp, "part-00000.parquet")
    with open(stale_part, "wb") as fh:
        fh.write(b"not really parquet")
    with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
        json.dump({"seed": 999, "chunk_sf": 0.001, "turns_per_sf": 1}, fh)
    out = datagen.ensure_transcripts(0.002, workers=1)
    # the stale bytes are gone — chunk 0 was regenerated and parses as parquet
    t0 = pq.read_table(os.path.join(out, "part-00000.parquet"))
    assert t0.num_rows > 0

    # matching manifest → valid partials ARE reused (resume semantics intact)
    import shutil

    part0 = os.path.join(out, "part-00000.parquet")
    good = open(part0, "rb").read()
    shutil.move(out, tmp.replace(".tmpdir", "") + ".keep")  # free the final path
    keep = tmp.replace(".tmpdir", "") + ".keep"
    os.makedirs(tmp)
    shutil.copy(os.path.join(keep, "part-00000.parquet"), os.path.join(tmp, "part-00000.parquet"))
    shutil.copy(os.path.join(keep, "_manifest.json"), os.path.join(tmp, "_manifest.json"))
    mtime = os.path.getmtime(os.path.join(tmp, "part-00000.parquet"))
    out2 = datagen.ensure_transcripts(0.002, workers=1)
    assert open(os.path.join(out2, "part-00000.parquet"), "rb").read() == good
    assert os.path.getmtime(os.path.join(out2, "part-00000.parquet")) == mtime  # not rewritten
